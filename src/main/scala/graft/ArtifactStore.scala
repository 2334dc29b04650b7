package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session warehouse for derived LABELING artifacts (SURVEY §2.2 /
  * §2.3) — the stored-index contract (sim_ivf_incremental's centroid
  * table, dedup_incremental_minhash's band index) extended to cluster
  * labelings: a pipeline query COMPUTES a labeling once and publishes it
  * as a parquet relation; evaluation queries READ the stored relation
  * instead of re-running the clustering they grade, and "stored ≡
  * recompute" is exactly what the oracle gate checks (the evaluation
  * query's oracle SQL recomputes the labeling from scratch — a stale or
  * divergent artifact hash-mismatches).
  *
  * The root is a fresh per-JVM temp directory: artifacts can never leak
  * across sessions or survive a code change (r10 verdict #3 asked for
  * the labeling store; per-JVM scoping is what makes it safe to key by
  * name alone). On a cluster this root would be a durable warehouse
  * path and the key a versioned table name.
  */
object ArtifactStore {
  private lazy val root: String =
    java.nio.file.Files.createTempDirectory("graft-artifacts").toString

  private def path(key: String, dir: String): String =
    s"$root/${java.nio.file.Paths.get(dir).getFileName}/$key"

  /** Compute `df` and (over)write it as artifact `key` for corpus `dir`,
    * returning the stored relation — the PIPELINE side: the publishing
    * query always pays its own compute, so its benchmark time stays the
    * honest cost of the operator plus the materialization.
    */
  def publish(spark: SparkSession, key: String, dir: String)(
      df: => DataFrame): DataFrame = synchronized {
    val p = path(key, dir)
    df.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  /** Read artifact `key` for corpus `dir`, computing and storing it
    * first on miss — the EVALUATION side: when the pipeline query
    * already ran in this session the labeling is a parquet scan; on a
    * cold session the evaluation is self-contained and pays the
    * compute exactly once.
    */
  def readOrCompute(spark: SparkSession, key: String, dir: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val p = path(key, dir)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      compute.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }
}
