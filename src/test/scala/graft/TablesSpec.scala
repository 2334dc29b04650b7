package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-drift guard. The r8 round was lost to a silent physical-type
  * change in the driver-regenerated events.parquet (TIMESTAMP(NANOS) →
  * timestamp[us]) that nothing smoke-read: 26 queries and 14 specs died
  * on one analysis error. This spec pins (a) every testdata table loads,
  * and (b) `Tables.events` yields the SAME TimestampType rows under every
  * physical `ts` layout that has shipped — committed mini-fixtures in
  * fixtures/events_layouts/ (regenerate: tools/gen_events_layout_fixtures
  * .py) carry one file per layout with identical logical rows.
  */
class TablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // the four fixture rows' epoch micros: 2024-01-01T00:00Z + 0..3 hours
  private val BaseUs = 1704067200000000L
  private val ExpectedUs = (0 until 4).map(i => BaseUs + i * 3600000000L)

  private def loadLayout(file: String) = {
    val dir = Files.createTempDirectory("graft-events-layout")
    Files.copy(Paths.get(s"fixtures/events_layouts/$file"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Tables.events(spark, dir.toString)
  }

  test("every testdata table loads with its key column present") {
    val keyed = Seq(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    for ((t, key) <- keyed) {
      val df = Tables.table(spark, TestSpark.sfDir, t)
      assert(df.columns.contains(key), s"$t missing $key")
      assert(df.limit(1).count() === 1, s"$t is empty")
    }
    assert(Tables.events(spark, TestSpark.sfDir).schema("ts").dataType
      === TimestampType, "events.ts must surface as TimestampType")
  }

  test("events.ts normalizes to identical TimestampType rows under BOTH shipped physical layouts") {
    val perLayout = Seq("events_us.parquet", "events_ns.parquet").map { f =>
      val df = loadLayout(f)
      assert(df.schema("ts").dataType === TimestampType, f)
      val us = df.orderBy(col("event_id"))
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      assert(us === ExpectedUs, s"$f decoded epochs differ")
      us
    }
    assert(perLayout.distinct.size === 1)
  }

  test("the TIMESTAMP_NTZ fallback branch normalizes identically (sessions without the LTZ-infer conf)") {
    val conf = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val saved = spark.conf.get(conf)
    spark.conf.set(conf, "true")
    try {
      val df = loadLayout("events_us.parquet")
      assert(df.schema("ts").dataType === TimestampType)
      val us = df.orderBy(col("event_id"))
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      assert(us === ExpectedUs)
    } finally spark.conf.set(conf, saved)
  }

  test("the nanos layout surfaces as LongType without the loader (documents the raw shape)") {
    // raw read: nanosAsLong turns TIMESTAMP(NANOS) into a bare long —
    // the shape Tables.eventsRaw's LongType branch exists for
    val dir = Files.createTempDirectory("graft-events-raw")
    Files.copy(Paths.get("fixtures/events_layouts/events_ns.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val raw = spark.read.parquet(dir.resolve("events.parquet").toString)
    assert(raw.schema("ts").dataType === LongType)
  }
}
