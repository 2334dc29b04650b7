package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-warehouse helpers (SURVEY §4): pre-shuffle a fact table ONCE at
  * write time so every subsequent equi-join or aggregation on the bucket
  * key plans with zero exchanges on that side.
  *
  * At 100 TB this is the difference between re-shuffling 100 TB per query
  * and never shuffling it again: `lineitem` bucketed by `l_orderkey` joins
  * `orders` bucketed by `o_orderkey` with NO Exchange in the plan (asserted
  * by WarehouseSpec). Spark's native catalog tracks the bucketing; bucket
  * counts must match across co-joined tables.
  */
object Warehouse {

  /** Idempotent dataset (namespace) creation — the reference's
    * make_dataset (bq.py:84-110: create the BQ dataset, tolerate
    * already-exists). Returns true when the namespace was newly created.
    * Catalog namespaces are the Spark twin of BQ datasets: tables created
    * as `name.table` live under them, and a second call is a no-op.
    */
  def makeDataset(spark: SparkSession, name: String): Boolean = {
    val existed = spark.catalog.databaseExists(name)
    if (!existed) spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")
    !existed
  }

  /** Write `df` as a bucketed, sorted managed table (parquet). */
  def bucketize(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Co-bucketed join on `key`: both sides must have been bucketized with
    * the same bucket count. Plans as a sort-merge join with no exchange.
    */
  def cobucketJoin(spark: SparkSession, left: String, right: String,
      key: (String, String)): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(key._1) === spark.table(right)(key._2))

  /** Morton (Z-order) interleave of two 10-bit bucket columns → a 20-bit
    * curve position. Pure built-in bit ops, so the whole projection stays
    * inside WholeStageCodegen — no kernel needed.
    */
  private def morton10(a: Column, b: Column): Column =
    (0 until 10).map { bit =>
      (shiftleft(shiftrightunsigned(a, bit).bitwiseAND(lit(1)), 2 * bit + 1))
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, bit).bitwiseAND(lit(1)), 2 * bit))
    }.reduce(_.bitwiseOR(_))

  /** Z-order layout rewrite: cluster a table on the Morton interleave of
    * TWO dimensions so range predicates on EITHER (or both) prune files —
    * the multi-dimensional complement of `bucketize`'s single-key sort.
    * A ts-sorted layout answers ts ranges from few files but scatters any
    * user_id range across ALL of them; the Z-curve keeps both dimensions
    * coherent per file (each file covers a contiguous curve segment ≈ a
    * rectangle stack in (a, b) space), which is what lets a 100 TB scan
    * skip row groups on min/max stats for every leading-dimension-free
    * predicate. Dimensions are min/max-scaled to 10-bit buckets via one
    * tiny 1-row aggregate (exact integer arithmetic, `div` both ends);
    * at production scale the bucket boundaries come from quantiles
    * instead when a dimension is heavily skewed — the interleave and the
    * range-partitioned write are unchanged. WarehouseSpec measures the
    * claim: files whose (min, max) span contains matching rows, z-layout
    * vs time-sorted layout, on a user-range predicate.
    */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String, outDir: String,
      nFiles: Int): Unit = {
    val stats = df.agg(
      min(col(dimA)).cast("long").as("amin"),
      max(col(dimA)).cast("long").as("amax"),
      min(col(dimB)).cast("long").as("bmin"),
      max(col(dimB)).cast("long").as("bmax")).collect()(0)
    // empty input / all-null dimension → no curve to sort by: write the
    // input unchanged instead of NPE-ing on the null min/max
    if (stats.isNullAt(0) || stats.isNullAt(2)) {
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    val (amin, amax) = (stats.getLong(0), stats.getLong(1))
    val (bmin, bmax) = (stats.getLong(2), stats.getLong(3))
    def bucket(cn: String, lo: Long, hi: Long): Column = expr(
      s"cast(((cast($cn as bigint) - ${lo}L) * 1024) div ${hi - lo + 1}L as int)")
    val z = morton10(
      bucket(dimA, amin, amax), bucket(dimB, bmin, bmax))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Small-file compaction for a parquet directory — the standing
    * maintenance task of any incrementally-appended warehouse (the
    * reference's daily `recent`-feed appends produce one small file per
    * load; a year of cron runs is 365 files a scan must open, seek, and
    * schedule tasks for). Rewrites the directory into
    * ceil(totalBytes / targetBytes) evenly-sized files (repartition, not
    * coalesce: coalesce merges ADJACENT partitions and inherits their
    * skew; an even rewrite is the point of compacting), then swaps the
    * rewrite in via rename — readers never observe a half-written
    * directory. Returns (files before, files after).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(dir)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path + ".compact_tmp")
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new Path(path + ".compact_bak")
    fs.rename(dir, bak)
    fs.rename(tmp, dir)
    fs.delete(bak, true)
    val after = fs.listStatus(dir)
      .count(f => f.isFile && !f.getPath.getName.startsWith("_"))
    (dataFiles.length, after)
  }

  /** Partition-level retention for the year-partitioned warehouse — the
    * fourth standing maintenance task (compact ✓, z-order ✓, analyze ✓):
    * drop every `cve_year=K` partition with K < minYear. The delete IS
    * the partition prune — whole directories unlink, no data file is
    * read or rewritten, so cost is O(partitions dropped) no matter the
    * table size (the same reason the reference ages out by re-creating
    * BigQuery partitions rather than DML-deleting rows). Non-numeric
    * partition dirs (e.g. a hive null partition) are retained — aging
    * out rows of UNKNOWN year silently would be data loss. Returns
    * (partitions before, partitions after).
    */
  def retain(spark: SparkSession, path: String, minYear: Int): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(dir)
      .filter(f => f.isDirectory && f.getPath.getName.startsWith("cve_year="))
      .map(_.getPath)
    val drop = parts.filter(p =>
      p.getName.stripPrefix("cve_year=").toIntOption.exists(_ < minYear))
    drop.foreach(p => fs.delete(p, true))
    (parts.length, parts.length - drop.length)
  }

  /** Zero-copy snapshot of a parquet table directory — the fifth
    * standing maintenance task (compact ✓, z-order ✓, analyze ✓,
    * retention ✓, snapshot ✓): publish a read-only point-in-time view
    * before a risky rewrite, for a reproducible training run, or as the
    * "yesterday" side of q_snapshot_diff. Every data file HARDLINKS
    * into the destination (O(files) metadata ops, zero bytes moved —
    * the POSIX equivalent of a manifest-only snapshot; object-store
    * deployments would swap the link call for a server-side copy), and
    * because parquet files are immutable-by-convention the link is
    * safe: compact/retain REPLACE files (the snapshot's inode link
    * survives the source's unlink) rather than mutating them in place.
    * Directory structure (hive partitions) is mirrored recursively;
    * filesystems without hardlink support fall back to a byte copy per
    * file. Returns (files linked, files copied).
    */
  def snapshot(spark: SparkSession, path: String, dest: String): (Int, Int) = {
    import java.nio.file.{Files, Paths, Path => JPath}
    var linked = 0
    var copied = 0
    def walk(src: JPath, dst: JPath): Unit = {
      Files.createDirectories(dst)
      val listing = Files.list(src)
      try listing.forEach { p =>
        val t = dst.resolve(p.getFileName)
        if (Files.isDirectory(p)) walk(p, t)
        else if (!p.getFileName.toString.startsWith("_")) {
          try { Files.createLink(t, p); linked += 1 }
          catch { case _: UnsupportedOperationException |
                       _: java.nio.file.FileSystemException =>
            Files.copy(p, t); copied += 1 }
        }
      } finally listing.close()
    }
    val srcRoot = Paths.get(path)
    require(Files.isDirectory(srcRoot), s"not a table directory: $path")
    require(!Files.exists(Paths.get(dest)),
      s"snapshot destination exists: $dest") // never silently overlay
    walk(srcRoot, Paths.get(dest))
    (linked, copied)
  }

  /** Long-format column statistics in ONE pass, one 1-row aggregate:
    * (col_name, n_rows, n_nulls, min_val, max_val[, approx_ndv]) per
    * analyzed column. Everything but the optional NDV is exact integer/
    * string arithmetic; the NDV is HLL++ (approx_count_distinct,
    * rsd 2%) — constant memory at any scale, where an exact distinct
    * would shuffle one row per key. min/max render via cast-to-string so
    * one schema serves every column type (callers pick the value
    * expression — e.g. a timestamp cast to epoch seconds — so the
    * rendering is engine-portable).
    */
  def stats(df: DataFrame, cols: Seq[(String, Column)],
      withNdv: Boolean = false): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap {
      case (n, c) =>
        Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"${n}__nulls"),
          min(c).cast("string").as(s"${n}__min"),
          max(c).cast("string").as(s"${n}__max")) ++
          (if (withNdv) Seq(approx_count_distinct(c, 0.02).as(s"${n}__ndv"))
           else Nil)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { case (n, _) =>
      val base = Seq(lit(n).as("col_name"), col("n_rows"),
        col(s"${n}__nulls").as("n_nulls"),
        col(s"${n}__min").as("min_val"), col(s"${n}__max").as("max_val"))
      struct(base ++ (if (withNdv) Seq(col(s"${n}__ndv").as("approx_ndv"))
                      else Nil): _*)
    }
    one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
      .orderBy(col("col_name"))
  }

  /** ANALYZE for a parquet directory — the third standing maintenance
    * task beside [[compact]] and [[zorderWrite]]: compute [[stats]]
    * (with the NDV sketch) over the named columns and persist them as a
    * `<path>.stats` parquet artifact, so planners and embedders read
    * row counts / null fractions / bounds / cardinalities without
    * scanning the table (the reference warehouse's table-metadata role,
    * schema.json-adjacent). Overwrite-idempotent; returns the stats
    * read back from disk.
    */
  def analyze(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    stats(df, cols.map(c => c -> df(c)), withNdv = true)
      .coalesce(1).write.mode("overwrite").parquet(path + ".stats")
    spark.read.parquet(path + ".stats")
  }
}
