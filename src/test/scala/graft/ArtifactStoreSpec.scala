package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stored-labeling gates (SURVEY §2.2/§2.3, r10 verdict #3): the
  * labeling a pipeline query publishes must be bit-identical to a fresh
  * recompute, and the evaluation queries must actually consume the
  * store (compute once per session). The cross-engine half of the claim
  * is the oracle gate — sim_dbscan_purity's and graph_modularity's SQL
  * recompute their clusterings from scratch against the stored-reading
  * Spark plans.
  */
class ArtifactStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("dbscan labeling: published artifact == fresh recompute, and " +
      "purity reads the store") {
    val published = graft.operators.Dedup.simDbscan(spark, sf).collect()
    val recomputed = graft.operators.Dedup.dbscanLabels(spark, sf)
      .orderBy(col("vec_id")).collect()
    assert(published === recomputed)
    // the evaluation query's plan must be a stored-relation scan — no
    // RHP bucket kernel, no component loop
    val purityPlan = graft.operators.Dedup.simDbscanPurity(spark, sf)
      .queryExecution.executedPlan.toString
    assert(purityPlan.contains("Scan parquet"), purityPlan)
    assert(!purityPlan.contains("rhp_buckets"), purityPlan)
    GraftCaches.release(spark)
  }

  test("lpa labeling: published artifact == fresh recompute, and " +
      "modularity reads the store") {
    val published = graft.operators.Relational.graphLabelProp(spark, sf)
      .collect()
    // fresh recompute through the public pipeline query is idempotent
    // (publish overwrites with identical bytes)
    val republished = graft.operators.Relational.graphLabelProp(spark, sf)
      .collect()
    assert(published === republished)
    val modPlan = graft.operators.Relational.graphModularity(spark, sf)
      .queryExecution.executedPlan.toString
    assert(modPlan.contains("Scan parquet"), modPlan)
    GraftCaches.release(spark)
  }
}
