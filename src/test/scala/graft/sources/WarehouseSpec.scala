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

  test("retain: drops whole below-cutoff year partitions, keeps the rest " +
      "and non-numeric partitions, readers see only retained rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retain")
      .resolve("warehouse").toString
    val src = graft.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"),
        (lit(2019) + col("event_id") % 6).cast("int").as("cve_year"))
    src.write.partitionBy("cve_year").parquet(dir)
    // a non-numeric partition dir must survive retention untouched
    val weird = new java.io.File(s"$dir/cve_year=__HIVE_DEFAULT_PARTITION__")
    assert(weird.mkdir())
    val expected = src.filter(col("cve_year") >= 2022)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0)
    val (before, after) = Warehouse.retain(spark, dir, minYear = 2022)
    assert(before === 7 && after === 4) // 2019-2021 dropped, weird kept
    assert(weird.exists())
    val got = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0)
    assert(got === expected)
    // idempotent: a second pass drops nothing
    assert(Warehouse.retain(spark, dir, minYear = 2022) === ((4, 4)))
  }

  test("snapshot: zero-copy hardlink clone survives source compaction and " +
      "retention, never overlays an existing destination") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap")
    val dir = root.resolve("warehouse").toString
    val snap = root.resolve("snap_v1").toString
    val src = graft.Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"),
        (lit(2019) + col("event_id") % 4).cast("int").as("cve_year"))
    // several small appends per partition → compaction has work to do
    (0 until 3).foreach { i =>
      src.filter(col("user_id") % 3 === i).coalesce(1)
        .write.partitionBy("cve_year").mode("append").parquet(dir)
    }
    val checksum = spark.read.parquet(dir)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0)

    val (linked, copied) = Warehouse.snapshot(spark, dir, snap)
    assert(linked > 0 && copied === 0, // POSIX tmpfs: links, not copies
      s"expected pure hardlink snapshot, got linked=$linked copied=$copied")
    assert(spark.read.parquet(snap)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0) === checksum)

    // maintenance on the SOURCE must not disturb the snapshot: compact
    // rewrites+unlinks the source files (snapshot inodes survive) and
    // retention unlinks whole partitions
    (2019 to 2022).foreach { y =>
      Warehouse.compact(spark, s"$dir/cve_year=$y", 512L << 20)
    }
    Warehouse.retain(spark, dir, minYear = 2021)
    assert(spark.read.parquet(snap)
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0) === checksum)

    // a second snapshot refuses to overlay the existing one
    assertThrows[IllegalArgumentException] {
      Warehouse.snapshot(spark, dir, snap)
    }
  }

  test("zorder: a user-range predicate touches far fewer files than on a " +
      "time-sorted layout, losslessly") {
    val events = graft.Tables.events(spark, graft.TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val nFiles = 16
    val zDir = graft.TestSpark.tmpDir("wh_zorder")
    val tDir = graft.TestSpark.tmpDir("wh_tsorted")
    Warehouse.zorderWrite(events, "user_id", "ts", zDir, nFiles)
    // the 1-D baseline every warehouse starts with: range-sorted by time
    events.repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(tDir)

    // lossless rewrite
    val z = spark.read.parquet(zDir)
    assert(z.count() === events.count())
    assert(z.agg(sum(col("event_id"))).collect()(0) ===
      events.agg(sum(col("event_id"))).collect()(0))

    // files whose CONTENT matches a selective user range — the file-skip
    // proxy (parquet min/max stats prune exactly the non-matching ones)
    def filesTouched(dir: String, lo: Long, hi: Long): Long =
      spark.read.parquet(dir)
        .select(input_file_name().as("f"), col("user_id"))
        .filter(col("user_id").between(lo, hi))
        .select(col("f")).distinct().count()
    val (lo, hi) = (3L, 4L) // 2 of the 15 users at this SF (~13%)
    val zTouched = filesTouched(zDir, lo, hi)
    val tTouched = filesTouched(tDir, lo, hi)
    // time-sort scatters every user across ~all files; the Z-curve keeps
    // the user dimension coherent per file
    assert(tTouched >= nFiles - 2,
      s"baseline should scatter the range over ~all files: $tTouched")
    assert(zTouched * 2 <= tTouched,
      s"z-order should halve files touched: z=$zTouched t=$tTouched")
    // and the time dimension must not be sacrificed: a ~2-day slice still
    // skips most z-files (curve segments are rectangle stacks, not
    // time-scattered shuffles)
    val tsStats = events.agg(min(col("ts")).cast("long"),
      max(col("ts")).cast("long")).collect()(0)
    val (t0, t1) = (tsStats.getLong(0), tsStats.getLong(1))
    val span = t1 - t0
    val zTs = spark.read.parquet(zDir)
      .select(input_file_name().as("f"), col("ts"))
      .filter(col("ts").cast("long").between(t0, t0 + span / 32))
      .select(col("f")).distinct().count()
    assert(zTs <= nFiles / 2,
      s"a 1/32 time slice should skip at least half the z-files: $zTs")
  }

  test("zorder: empty and all-null-dimension inputs write unchanged, no NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val eDir = graft.TestSpark.tmpDir("wh_z_empty")
    Warehouse.zorderWrite(empty, "a", "b", eDir, 4)
    assert(spark.read.parquet(eDir).count() === 0)

    val nulls = Seq((Some(1L), Option.empty[Long]), (Some(2L), None))
      .toDF("a", "b")
    val nDir = graft.TestSpark.tmpDir("wh_z_nulls")
    Warehouse.zorderWrite(nulls, "a", "b", nDir, 4)
    val back = spark.read.parquet(nDir)
    assert(back.count() === 2)
    assert(back.agg(sum(col("a"))).collect()(0).getLong(0) === 3L)
  }

  test("analyze: persisted stats artifact is exact on count/nulls/bounds, " +
      "NDV within the HLL bound, overwrite-idempotent") {
    val src = Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val dir = TestSpark.tmpDir("wh_analyze") + "/orders"
    src.write.mode("overwrite").parquet(dir)

    def check(st: Array[org.apache.spark.sql.Row]): Unit = {
      val n = src.count()
      val byCol = st.map(r => r.getString(0) -> r).toMap
      assert(byCol.keySet === Set("o_orderkey", "o_custkey", "o_orderpriority"))
      st.foreach { r => assert(r.getLong(1) === n && r.getLong(2) === 0L) }
      val ok = byCol("o_orderkey")
      val exact = src.agg(min(col("o_orderkey")).cast("string"),
        max(col("o_orderkey")).cast("string"),
        count_distinct(col("o_orderkey"))).head()
      assert(ok.getString(3) === exact.getString(0))
      assert(ok.getString(4) === exact.getString(1))
      val (ndv, trueNdv) = (ok.getLong(5).toDouble, exact.getLong(2).toDouble)
      assert(math.abs(ndv - trueNdv) / trueNdv <= 0.06,
        s"o_orderkey NDV $ndv vs exact $trueNdv")
    }
    val first = Warehouse.analyze(spark, dir,
      Seq("o_orderkey", "o_custkey", "o_orderpriority")).collect()
    check(first)
    // the artifact lives beside the data and a re-run replaces it in place
    val again = Warehouse.analyze(spark, dir,
      Seq("o_orderkey", "o_custkey", "o_orderpriority")).collect()
    check(again)
    assert(spark.read.parquet(dir + ".stats").count() === 3)
  }
}
