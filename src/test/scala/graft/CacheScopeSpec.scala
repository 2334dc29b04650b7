package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational}

/** In-plan cache scoping: operators whose RETURNED plan no longer
  * references their internal persists must release them inline; only
  * true plan-referenced barriers may rely on the harness-level
  * GraftCaches.release contract. This spec runs operators back-to-back
  * WITHOUT GraftCaches.release and asserts the session's SQL-cache
  * population stays at exactly the documented barriers.
  */
class CacheScopeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Entry count of the session CacheManager — the API exposes only
    * isEmpty, so the private cachedData IndexedSeq is read reflectively
    * (test-only observability, not a runtime dependency).
    */
  private def sqlCacheCount: Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    val f = cm.getClass.getDeclaredField("cachedData")
    f.setAccessible(true)
    f.get(cm).asInstanceOf[IndexedSeq[_]].size
  }

  test("pagerank releases every SQL cache inline; cluster leaves exactly " +
      "its one plan-referenced barrier per run") {
    val dir = TestSpark.sfDir
    GraftCaches.release(spark) // clean baseline only — never called again
    assert(sqlCacheCount === 0)

    // graph_pagerank's output is checkpoint-truncated: its stationary
    // edge/vertex/dangling caches must all release inline
    Relational.graphPagerank(spark, dir).collect()
    assert(sqlCacheCount === 0,
      "pagerank must not leave SQL caches for the harness to clean")

    // dedup_cluster's returned plan references the contracted-label cache
    // (l0) — the ONE documented barrier. Its upstream ngram-pipeline
    // caches (t, ids, post) and the pair/edge caches release inline, so
    // back-to-back runs grow the cache population by exactly one entry
    // per run, not by the whole five-cache pipeline.
    val r1 = Dedup.dedupCluster(spark, dir).collect()
    assert(sqlCacheCount === 1,
      "cluster run 1 should leave exactly the l0 barrier cached")
    val r2 = Dedup.dedupCluster(spark, dir).collect()
    assert(sqlCacheCount === 2,
      "cluster run 2 should add exactly one more barrier, not a pipeline")
    assert(r2.map(_.toSeq).toSeq === r1.map(_.toSeq).toSeq)

    GraftCaches.release(spark)
    assert(sqlCacheCount === 0)
  }
}
