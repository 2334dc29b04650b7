package graft

/** Dev tool: dump `.explain("formatted")` for a comma-separated list of
  * declared queries into files (`<outdir>/<name>_<suffix>.txt`) — the
  * before/after plan evidence the optimization rounds commit under
  * plans/. Not part of the driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args(1)
    val outDir = args(2)
    val suffix = if (args.length > 3) args(3) else "before"
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] wrote $n")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      } finally GraftCaches.release(spark)
    }
    spark.stop()
  }
}
