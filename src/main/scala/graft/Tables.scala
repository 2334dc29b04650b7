package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and resolves its inputs here.
  * Parquet scans are left fully declarative so Catalyst pushes filters
  * and prunes columns at the source.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]) unless the session was built
    * with `spark.sql.legacy.parquet.nanosAsLong=true` — set once in
    * [[GraftSession]], never mutated here. We read nanos as raw longs and
    * truncate to microsecond timestamps — the same ns→µs truncation DuckDB
    * applies on read, so oracle comparisons stay exact. Integer `div` (not
    * fp division) because ~1.7e18 ns exceeds double's 53-bit integer range.
    */
  private def eventsRaw(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

  /** Register every table as a temp view so the full surface is reachable
    * from plain `spark.sql(...)` — together with the GraftExtensions
    * function registry (graft_cosine, graft_minhash, ...), a SQL-only
    * client gets the same engine the DataFrame API exposes.
    */
  def registerAll(s: SparkSession, d: String): Unit = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach(n => table(s, d, n).createOrReplaceTempView(n))
    events(s, d).createOrReplaceTempView("events")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
