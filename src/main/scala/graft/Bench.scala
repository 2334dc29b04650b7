package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Each query is forced through a `noop`-format write — every column of
  * every row is actually computed and serialized, so the optimizer cannot
  * prune unreferenced projections or drop sorts the way a bare `.count()`
  * lets it. Two timed passes run per query: `queries` reports the warm
  * (second) pass — the steady-state number, free of first-query JVM/codegen
  * warm-up — and `queries_cold` keeps the first pass for reference. A query
  * that throws is reported in `errors` with a negative time, never disguised
  * as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(GraftSession.envCpus)

    def timeOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      } finally {
        // operators persist intermediate relations (plan barriers + stats);
        // release them between queries so no query's cache squats on
        // executor memory for the rest of the suite (the r3 bench read
        // dedup_cluster at 49s purely from an earlier query's lingering
        // cache). Unpersist time is billed to the query that cached.
        spark.catalog.clearCache()
        // clearCache only drops SQL caches — localCheckpoint blocks (the
        // iterative operators' round barriers) are raw persisted RDDs that
        // stay pinned in the block manager until GC'd. In the r4 suite the
        // accumulated checkpoint blocks inflated every query after the
        // dedup block 3-7× (q1: 5.6s polluted vs 1.5s isolated).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

    // dev loop: SPARK_GRAFT_ONLY=a,b,c restricts the run; unset = full suite
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val cold = scala.collection.mutable.LinkedHashMap[String, Double]()
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      timeOne(fn) match {
        case Right(t1) =>
          cold(name) = t1
          timeOne(fn) match {
            case Right(t2) => warm(name) = t2
            case Left(err) => warm(name) = -1.0; errors(name) = err
          }
        case Left(err) =>
          cold(name) = -1.0; warm(name) = -1.0; errors(name) = err
      }
    }

    def rd(v: Double, dp: Int): String =
      new java.math.BigDecimal(v).setScale(dp, java.math.RoundingMode.HALF_UP)
        .toPlainString
    def r3(v: Double): String = rd(v, 3)
    def jmap(m: collection.Map[String, Double], dp: Int = 3): String =
      m.map { case (k, v) => s"\"$k\":${rd(v, dp)}" }.mkString("{", ",", "}")
    // escape backslash, quote, and ALL control chars — an exception message
    // with stray binary must not make the one-line JSON report unparseable
    def jstr(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def jsmap(m: collection.Map[String, String]): String =
      m.map { case (k, v) => s"\"${jstr(k)}\":\"${jstr(v)}\"" }
        .mkString("{", ",", "}")

    val total = warm.values.filter(_ >= 0).sum
    // Three report surfaces. The harness that collects stdout keeps only a
    // ~2 KB TAIL and parses the last JSON line it finds, and the suite has
    // outgrown fitting every per-query time in that window. So:
    //  1. BENCH_DETAIL.json (cwd = repo root, committed per round): the
    //     complete record — warm + cold per query, untruncated errors.
    //  2. a full-detail stdout line, printed FIRST (for humans scrolling).
    //  3. the FINAL line: suite total + the slowest queries, added
    //     slowest-first while the line fits the capture window ("n_queries"
    //     carries the true suite size so a partial map reads as partial).
    val detailJson =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${names.size},"queries":${jmap(warm)},"queries_cold":${jmap(cold)},"errors":${jsmap(errors)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detailJson + "\n").getBytes("UTF-8"))
    println(detailJson)
    val errBrief = errors.map { case (k, v) => (k, v.take(40)) }
    // empty errors are omitted from the final line — every byte counts
    // against the capture window, and absence-of-field reads as success
    val errPart =
      if (errBrief.isEmpty) "" else s""","errors":${jsmap(errBrief)}"""
    val slowestFirst = warm.toSeq.sortBy(-_._2)
    def finalLine(k: Int, dp: Int): String = {
      val shown = scala.collection.immutable.ListMap(slowestFirst.take(k): _*)
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${names.size},"detail":"BENCH_DETAIL.json","queries":${jmap(shown, dp)}$errPart,"sf":"$sfDir"}"""
    }
    // largest slowest-query prefix that fits the capture window at 2dp
    val line = (names.size to 1 by -1).iterator.map(finalLine(_, 2))
      .find(_.length <= 1800).getOrElse(finalLine(1, 1))
    println(line)
    spark.stop()
  }
}
