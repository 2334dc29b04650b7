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
    // Two report lines. The harness that collects this output keeps only a
    // short tail of stdout and parses the last JSON line it finds, so the
    // FINAL line must stay compact (~1.5 KB for ~50 queries): 3dp times,
    // no cold map, error messages truncated to a marker. The full-detail
    // line (cold pass + untruncated errors) is printed FIRST, for humans.
    println(s"""{"metric":"total_detail","value":${r3(total)},"unit":"sec","queries_cold":${jmap(cold)},"errors":${jsmap(errors)},"sf":"$sfDir"}""")
    val errBrief = errors.map { case (k, v) => (k, v.take(40)) }
    // empty errors are omitted from the final line — every byte counts
    // against the capture window, and absence-of-field reads as success
    val errPart =
      if (errBrief.isEmpty) "" else s""","errors":${jsmap(errBrief)}"""
    def finalLine(dp: Int): String =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(warm, dp)}$errPart,"sf":"$sfDir"}"""
    // stay comfortably inside a ~2 KB stdout-tail capture window (the
    // build tool prints a trailer line after us): first precision that fits
    // budget: line + "\n" + the build tool's ~80-char success trailer must
    // land inside the 2000-char capture, so the line start stays visible
    val line = Seq(3, 2, 1).map(finalLine).find(_.length <= 1880)
      .getOrElse(finalLine(0))
    println(line)
    spark.stop()
  }
}
