package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
