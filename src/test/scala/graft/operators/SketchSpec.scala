package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Sketch gate: approximate distinct counts (HLL++) land within the
  * configured error bound of the exact answer on the real events table —
  * the constant-memory path for cardinality at 100 TB, where an exact
  * distinct forces a full shuffle of every key.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within rsd bound of exact, per group and global") {
    val e = Tables.events(spark, TestSpark.sfDir)
    val merged = e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"),
        count_distinct(col("user_id")).as("exact"))
      .collect()
    assert(merged.nonEmpty)
    merged.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }

    val global = e.agg(
      approx_count_distinct(col("event_id"), rsd = 0.02).as("approx"),
      count_distinct(col("event_id")).as("exact")).head()
    val (a, x) = (global.getLong(0).toDouble, global.getLong(1).toDouble)
    assert(math.abs(a - x) / x <= 0.06, s"global: $a vs $x")
  }
}
