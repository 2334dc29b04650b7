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

  test("bitmapAgg + bitmapOrCount: union cardinality == count(DISTINCT) " +
      "of the union, idempotent under overlap") {
    import graft.functions.GraftFunctions
    val e = Tables.events(spark, TestSpark.sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val maxId = e.agg(max(col("user_id"))).head().getLong(0)
    val daily = e.groupBy(col("day"))
      .agg(org.apache.spark.sql.graft.GraftAggregates
        .bitmapAgg(col("user_id"), maxId).as("bm"))
    // OR over ALL days == global distinct (exactness of the union)
    val viaBitmap = daily
      .agg(GraftFunctions.bitmapOrCount(collect_list(col("bm"))).as("n"))
      .head().getLong(0)
    val exact = e.agg(count_distinct(col("user_id"))).head().getLong(0)
    assert(viaBitmap === exact)
    // idempotence: a day OR'd with itself twice adds nothing — the
    // property that makes sliding windows safe to overlap
    val one = daily.limit(1)
      .select(GraftFunctions.bitmapOrCount(array(col("bm"))).as("a"),
        GraftFunctions.bitmapOrCount(array(col("bm"), col("bm"))).as("b"))
      .head()
    assert(one.getLong(0) === one.getLong(1))
    // SQL surface: graft_bitmap_agg + graft_bitmap_or_count compose
    e.createOrReplaceTempView("ev_bm")
    val sql = spark.sql(
      s"""SELECT graft_bitmap_or_count(collect_list(bm)) AS n
          FROM (SELECT day, graft_bitmap_agg(user_id, ${maxId}L) AS bm
                FROM ev_bm GROUP BY day)""").head().getLong(0)
    assert(sql === exact)
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
