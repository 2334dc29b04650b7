package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.{TestSpark, Tables}
import graft.functions.GraftFunctions

/** Gates for the explicit runtime-filter join (q_bloom_semi_join): the
  * bloom prefilter must be result-INVISIBLE (the sketch admits false
  * positives, never false negatives — the exact semi join removes the
  * former, so nothing may remove the latter), and the probe must appear
  * in the physical plan on the fact side, before the join.
  */
class BloomSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bloom prefilter is result-identical to the plain semi join") {
    val dir = TestSpark.sfDir
    val got = Relational.qBloomSemiJoin(spark, dir).collect().map(_.toSeq)
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val want = Tables.lineitem(spark, dir)
      .join(urgent, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))
      .collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
  }

  test("bloom probe has no false negatives over the build keys") {
    val keys = spark.range(0, 10000).select(xxhash64(col("id")).as("h"))
    val bf = keys.agg(GraftFunctions.bloomAgg(col("h"), 10000L, 100000L))
      .head.getAs[Array[Byte]](0)
    val misses = keys
      .filter(!GraftFunctions.bloomMightContain(lit(bf), col("h"))).count()
    assert(misses === 0L)
  }

  test("bloom probe sits in the physical plan (map-side, not post-join)") {
    val plan = Relational.qBloomSemiJoin(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }
}
