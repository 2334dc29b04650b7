package graft

import org.apache.spark.sql.functions._

/** Dev tool: minimal clean-session check — does a pagerank round's plan
  * substitute the persisted edge relation (InMemoryRelation) or recompute
  * the build? Not part of the driver contract.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e6}%9.1f ms"); r
    }
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges0 = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
    val edges = edges0
      .join(edges0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edges persist+count")(edges.count())
    val scores = Barriers.roundBarrier(
      edges.select(col("src").as("v")).distinct()
        .select(col("v"), lit(1000000L).as("s")))
    val round = graft.operators.Relational
      .pagerankContrib(edges, scores, broadcast)
    val opt = round.queryExecution.optimizedPlan.toString
    println("round optimizedPlan contains InMemoryRelation: " +
      opt.contains("InMemoryRelation"))
    println("round optimizedPlan contains FileScan/LogicalRelation: " +
      (opt.contains("Relation") && opt.contains("parquet")))
    time("round 1")(round.write.format("noop").mode("overwrite").save())
    time("round 2")(round.write.format("noop").mode("overwrite").save())
    time("round 3")(round.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
