package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: same-window A/B timing of iterative-loop candidates — the
  * commerce edge build (cs persisted vs not), and barrier-every-round vs
  * chained rounds for the pagerank loop. Not part of the driver contract.
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e6}%9.1f ms"); r
    }
    def csRaw() = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    def edgesFrom(cs: DataFrame) =
      cs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))

    // ---- variant A: current shape (no cs persist) ----
    def buildA(): DataFrame = {
      val edges0 = edgesFrom(csRaw())
      val e = edges0
        .join(edges0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
          Seq("src"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    // ---- variant B: cs persisted, arms + outdeg read the cache ----
    def buildB(): (DataFrame, DataFrame) = {
      val cs = csRaw().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cs.count()
      val edges0 = edgesFrom(cs)
      val e = edges0
        .join(edges0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
          Seq("src"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); (e, cs)
    }
    // warm both paths once (codegen), then time
    val w1 = buildA(); w1.unpersist(true)
    val (w2, w2cs) = buildB(); w2.unpersist(true); w2cs.unpersist(true)
    val eA = time("build A (no cs persist)")(buildA())
    eA.unpersist(true)
    val (eB0, csB0) = time("build B (cs persisted)")(buildB())
    eB0.unpersist(true); csB0.unpersist(true)
    val eA2 = time("build A again")(buildA())
    val (eB, csB) = time("build B again")(buildB())

    // ---- pagerank loop: per-round barrier vs chained k=2 / k=5 ----
    def loop(edges: DataFrame, barrierEvery: Int): DataFrame = {
      val vertices = edges.select(col("src").as("v")).distinct()
      var scores = Barriers.roundBarrier(
        vertices.select(col("v"), lit(1000000L).as("s")))
      for (r <- 1 to 10) {
        val contrib = graft.operators.Relational
          .pagerankContrib(edges, scores, broadcast)
        val next = contrib.select(col("dst").as("v"),
          (lit(150000L) + coalesce(col("c"), lit(0L))).as("s"))
        scores =
          if (r % barrierEvery == 0 || r == 10) Barriers.roundBarrier(next)
          else next
      }
      scores
    }
    def run(label: String, edges: DataFrame, k: Int): Unit =
      time(label) {
        loop(edges, k).write.format("noop").mode("overwrite").save()
      }
    // ---- collect-per-round loop: LocalRelation scores, 1 job/round ----
    def loopCollect(edges: DataFrame): DataFrame = {
      import spark.implicits._
      val vertices = edges.select(col("src").as("v")).distinct()
      var cur: Array[(Long, Long)] = vertices
        .select(col("v"), lit(1000000L).as("s"))
        .as[(Long, Long)].collect()
      for (_ <- 1 to 10) {
        val scoresDf = cur.toSeq.toDF("v", "s")
        val contrib = graft.operators.Relational
          .pagerankContrib(edges, scoresDf, broadcast)
        cur = contrib.select(col("dst").as("v"),
          (lit(150000L) + coalesce(col("c"), lit(0L))).as("s"))
          .as[(Long, Long)].collect()
      }
      cur.toSeq.toDF("v", "s")
    }
    run("loop warm-up (k=1)", eA2, 1)
    run("loop barrier every round", eA2, 1)
    time("loop collect-per-round (warm-up)") {
      loopCollect(eA2).write.format("noop").mode("overwrite").save() }
    time("loop collect-per-round") {
      loopCollect(eA2).write.format("noop").mode("overwrite").save() }
    run("loop barrier every round (again)", eA2, 1)
    time("loop collect-per-round (again)") {
      loopCollect(eA2).write.format("noop").mode("overwrite").save() }
    // checksum parity of the two loop modes
    val s1 = loop(eA2, 1).agg(sum(col("s")), sum(col("v") * col("s"))).head()
    val s5 = loopCollect(eA2).agg(sum(col("s")), sum(col("v") * col("s"))).head()
    println(s"checksum barrier: $s1  collect: $s5  equal=${s1 == s5}")
    // ---- does the loop actually hit the edge cache? ----
    val eUnp = edgesFrom(csRaw())
      .join(edgesFrom(csRaw()).groupBy(col("src"))
        .agg(count(lit(1)).as("outdeg")), Seq("src"))
      .repartition(col("src")) // same shape, NO persist
    run("loop UNPERSISTED edges", eUnp, 1)
    run("loop persisted edges (again)", eA2, 1)
    // and how much does one contrib round cost alone, cached?
    val sc0 = loop(eA2, 1)
    time("single contrib round (cached edges)") {
      graft.operators.Relational.pagerankContrib(eA2, sc0, broadcast)
        .write.format("noop").mode("overwrite").save() }
    time("single contrib round again") {
      graft.operators.Relational.pagerankContrib(eA2, sc0, broadcast)
        .write.format("noop").mode("overwrite").save() }
    time("cache scan noop") {
      eA2.write.format("noop").mode("overwrite").save() }
    time("cache scan noop again") {
      eA2.write.format("noop").mode("overwrite").save() }
    // executed plan (post-AQE, with codegen ids) + per-operator metrics
    val oneRound = graft.operators.Relational
      .pagerankContrib(eA2, sc0, broadcast)
    oneRound.write.format("noop").mode("overwrite").save()
    println(oneRound.queryExecution.executedPlan.toString)
    // piecewise: join only (no agg), agg over cache without join
    time("join-only noop") {
      eA2.join(broadcast(sc0), col("src") === col("v"))
        .select(col("dst"), col("s"), col("outdeg"))
        .write.format("noop").mode("overwrite").save() }
    time("join-only noop again") {
      eA2.join(broadcast(sc0), col("src") === col("v"))
        .select(col("dst"), col("s"), col("outdeg"))
        .write.format("noop").mode("overwrite").save() }
    time("agg-only over cache") {
      eA2.groupBy(col("dst"))
        .agg(sum(expr("(85 * src) div (100 * outdeg)")))
        .write.format("noop").mode("overwrite").save() }
    time("join+div project noop") {
      eA2.join(broadcast(sc0), col("src") === col("v"))
        .select(col("dst"), expr("(85 * s) div (100 * outdeg)").as("contrib"))
        .write.format("noop").mode("overwrite").save() }
    eA2.unpersist(); eB.unpersist(); csB.unpersist()
    spark.stop()
  }
}
