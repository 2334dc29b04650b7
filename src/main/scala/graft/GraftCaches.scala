package graft

import org.apache.spark.sql.SparkSession

/** Session-wide cache release — the library-level contract for embedding
  * graft operators.
  *
  * Several operators persist intermediate relations as multi-consumer
  * caches or plan barriers (dedup clustering, sim_knn_graph's scored pairs,
  * graph_triangles' edge list). The RETURNED DataFrames are lazy, so those
  * persists cannot be released inside the operator — the caller's action
  * hasn't run yet. The contract is therefore: run your action(s), then call
  * `GraftCaches.release(spark)`. Bench / Verify / Scratch all honor it
  * between queries; any other embedding should do the same or the session
  * leaks one cached relation per operator call.
  */
object GraftCaches {
  /** Drop every SQL cache and raw persisted RDD in the session, blocking
    * (an async removal races the next query's eager cache materialization),
    * then drive the ContextCleaner with an explicit GC so broadcast blocks
    * and shuffle files — whose release is reference-queue-driven — are
    * freed too instead of piling up across a long multi-query session.
    */
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    System.gc()
  }
}
