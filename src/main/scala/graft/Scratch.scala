package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: run one named query with explain. Not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_pricing_summary")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.build(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    df.show(20, false)
    GraftCaches.release(spark) // operator persists die with the action
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "cache leak: persisted RDDs survived GraftCaches.release")
    spark.stop()
  }
}
