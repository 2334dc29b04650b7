package graft.sources

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Bucketed-warehouse gate: a co-bucketed fact join must plan with ZERO
  * exchanges — the write-once-pre-shuffle that makes repeated fact joins
  * affordable at warehouse scale.
  */
class WarehouseSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("co-bucketed fact join plans without any Exchange") {
    val li = Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val od = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_custkey"))
    Warehouse.bucketize(li, "li_bkt", "l_orderkey", numBuckets = 8)
    Warehouse.bucketize(od, "od_bkt", "o_orderkey", numBuckets = 8)

    val joined = Warehouse.cobucketJoin(spark, "li_bkt", "od_bkt",
      ("l_orderkey", "o_orderkey"))

    // correctness: same result as the plain (shuffling) join
    val expected = li.join(od, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() === expected)
    assert(expected > 0)

    // plan shape: no Exchange anywhere — bucketing satisfied both sides'
    // distribution requirements at the scan
    val exec = joined.queryExecution.executedPlan
    val exchanges = exec.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"expected zero exchanges in bucketed join, got:\n$exec")
  }

  test("makeDataset: idempotent namespace creation, tables live under it") {
    assert(Warehouse.makeDataset(spark, "graft_ds_spec"))
    assert(!Warehouse.makeDataset(spark, "graft_ds_spec")) // second call no-op
    assert(spark.catalog.databaseExists("graft_ds_spec"))
    spark.range(3).write.mode("overwrite")
      .saveAsTable("graft_ds_spec.probe")
    assert(spark.table("graft_ds_spec.probe").count() === 3)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val agg = spark.table("li_bkt").groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
    agg.collect()
    val exchanges = agg.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }
    assert(exchanges.isEmpty)
  }

  test("compact: merges an incrementally-appended directory losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .resolve("events").toString
    // simulate 12 small incremental appends (one file each)
    val src = graft.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    (0 until 12).foreach { i =>
      src.filter(col("event_id") % 12 === i).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val before = src.count()
    val checksumBefore = spark.read.parquet(dir)
      .agg(sum(col("event_id")), sum(col("user_id"))).collect()(0)
    val (nBefore, nAfter) = Warehouse.compact(spark, dir, 512L << 20)
    assert(nBefore >= 12, s"expected >=12 input files, saw $nBefore")
    assert(nAfter === 1, s"512MB target should compact to 1 file: $nAfter")
    // lossless: same rows, same content checksums, still readable
    val after = spark.read.parquet(dir)
    assert(after.count() === before)
    assert(after.agg(sum(col("event_id")), sum(col("user_id")))
      .collect()(0) === checksumBefore)
  }
}
