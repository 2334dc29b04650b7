package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev tool: same-window sweep of the bisection probe fan-out on the
  * shipped sf corpus — wall time + equality checksums per fan, both the
  * ungrouped and grouped cores. Not part of the driver contract.
  */
object BisectProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e6}%9.1f ms"); r
    }
    val cents = Tables.lineitem(spark, dir)
      .select((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("bigint").as("v"))
    val grouped = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("grp"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("bigint").as("v"))
    val fans = sys.env.get("BISECT_FANS")
      .map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(8, 16, 32, 8, 16, 32)) // repeat: ride through noise
    var ref: String = null
    var refG: String = null
    for (fan <- fans) {
      val r = time(s"ungrouped fan=$fan") {
        graft.operators.Relational.quantileBisectCore(cents, fan)
          .collect().mkString("|")
      }
      if (ref == null) ref = r else assert(r == ref, s"fan=$fan mismatch")
      GraftCaches.release(spark)
      val g = time(s"grouped   fan=$fan") {
        graft.operators.Relational.groupQuantileBisectCore(grouped, fan)
          .collect().mkString("|")
      }
      if (refG == null) refG = g else assert(g == refG, s"fan=$fan mismatch")
      GraftCaches.release(spark)
    }
    println("all fans bit-identical")
    spark.stop()
  }
}
