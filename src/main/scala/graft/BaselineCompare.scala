package graft

import org.apache.spark.sql.functions._

/** Head-to-head on the reference's ACTUAL workload: feed ETL throughput.
  *
  * Times graft's schema-driven Spark ingest (gz feed → parsed nested CVE
  * rows → parquet warehouse append shape) over a generated large feed.
  * The single-node reference equivalent (gzip + json.loads + per-CVE scrub
  * loop + newline-JSON dump, mirroring bq_nvd/etl.py extract+transform) is
  * timed by tools/baseline_nvd.py on the same file; BASELINE.md records
  * both.
  */
object BaselineCompare {
  def main(args: Array[String]): Unit = {
    val feed = args.headOption.getOrElse("/tmp/nvd_big/nvdcve-1.1-big.json.gz")
    val out = if (args.length > 1) args(1) else "/tmp/nvd_big/warehouse"
    val spark = GraftSession.build(GraftSession.envCpus)

    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GRAFT_TIMING $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    // parse + flatten + materialize every row/column (noop sink)
    timed("ingest_noop") {
      graft.sources.NvdEtl.ingest(spark, feed)
        .write.format("noop").mode("overwrite").save()
    }
    // parse + flatten + year-partitioned parquet warehouse write
    timed("ingest_to_warehouse") {
      val df = graft.sources.NvdEtl.ingest(spark, feed)
      df.withColumn("cve_year", graft.sources.NvdEtl.cveYear)
        .write.partitionBy("cve_year").mode("overwrite").parquet(out)
    }
    // the query the reference answers after loading: nested count
    timed("count_nested") {
      println("rows=" + graft.sources.NvdEtl.ingest(spark, feed)
        .agg(count(graft.sources.NvdEtl.cveId)).head().getLong(0))
    }
    spark.stop()
  }
}
