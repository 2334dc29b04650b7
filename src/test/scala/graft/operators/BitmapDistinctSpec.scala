package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Gate for the exact fixed-domain bitmap distinct aggregate
  * ([[org.apache.spark.sql.graft.BitmapDistinct]]): exact parity with
  * count(DISTINCT) on the real orders table, partitioning independence
  * (OR-merge is associative/commutative), and the loud-cap contract —
  * out-of-domain ids and over-cap domains THROW instead of degrading.
  */
class BitmapDistinctSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def bd(id: org.apache.spark.sql.Column, maxId: Long) =
    org.apache.spark.sql.graft.GraftAggregates.bitmapDistinct(id, maxId)

  test("bitmap distinct == count(DISTINCT) per group and global, " +
      "partitioning-independent") {
    val o = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderpriority"), col("o_custkey"))
    val maxId = o.agg(max(col("o_custkey"))).head().getLong(0)
    def run(parts: Int) = o.repartition(parts)
      .groupBy(col("o_orderpriority"))
      .agg(bd(col("o_custkey"), maxId).as("bm"),
        count_distinct(col("o_custkey")).as("cd"))
      .orderBy(col("o_orderpriority"))
      .collect()
    val r13 = run(13)
    assert(r13.nonEmpty)
    r13.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"${r.getString(0)}: bitmap ${r.getLong(1)} vs exact ${r.getLong(2)}"))
    assert(run(1).map(_.toSeq).toSeq === r13.map(_.toSeq).toSeq)
    val g = o.agg(bd(col("o_custkey"), maxId).as("bm"),
      count_distinct(col("o_custkey")).as("cd")).head()
    assert(g.getLong(0) === g.getLong(1))
  }

  test("loud caps: over-cap domain and out-of-domain id throw; " +
      "nulls are skipped like SQL aggregates") {
    import spark.implicits._
    // domain cap is a constructor require — fails at plan build
    val e1 = intercept[Exception] {
      Seq(1L).toDF("id").agg(bd(col("id"), 1L << 26)).collect()
    }
    assert(e1.getMessage.contains("bitmap_distinct"), e1.getMessage)
    // out-of-domain id must THROW at execution, never wrap or drop
    val e2 = intercept[Exception] {
      Seq(0L, 5L).toDF("id").agg(bd(col("id"), 3L)).collect()
    }
    assert(e2.getMessage.contains("outside declared domain"), e2.getMessage)
    // null ids drop (SQL null semantics), they do not become bit 0
    val withNull = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("id")
      .agg(bd(col("id"), 10L)).head().getLong(0)
    assert(withNull === 2L)
  }
}
