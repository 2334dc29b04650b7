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

  test("durable root: a labeling published by one session is READ, not " +
      "recomputed, by the next; versions are immutable behind an atomic " +
      "CURRENT pointer; corpora key by absolute path, not basename") {
    val durableRoot = TestSpark.tmpDir("graft-durable-artifacts")
    // two corpus dirs sharing a basename must not alias (r11 advice):
    // same key + same-basename dirs, different content
    val cA = TestSpark.tmpDir("corpusA") + "/sf"
    val cB = TestSpark.tmpDir("corpusB") + "/sf"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cA))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cB))
    // newSession(): fresh runtime conf over the shared context — and
    // ArtifactStore keeps NO in-memory state beyond the (unused here)
    // temp default root, so resolution in s2 can only come from disk
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.artifactRoot", durableRoot)
    import s1.implicits._
    ArtifactStore.publish(s1, "lbl", cA)(Seq((1L, 10L)).toDF("v", "c"))
    ArtifactStore.publish(s1, "lbl", cB)(Seq((2L, 20L)).toDF("v", "c"))
    // second publish to the SAME (key, corpus) creates a NEW version;
    // CURRENT repoints, the old version dir stays on disk untouched
    ArtifactStore.publish(s1, "lbl", cA)(Seq((3L, 30L)).toDF("v", "c"))
    // "cold" session, same durable root: readOrCompute must resolve the
    // stored CURRENT version without ever invoking the compute thunk
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.artifactRoot", durableRoot)
    val gotA = ArtifactStore.readOrCompute(s2, "lbl", cA) {
      fail("compute thunk invoked — durable artifact was not read")
    }.collect()
    assert(gotA.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 30L)))
    val gotB = ArtifactStore.readOrCompute(s2, "lbl", cB) {
      fail("compute thunk invoked — durable artifact was not read")
    }.collect()
    assert(gotB.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2L, 20L)))
    // every published version remains on disk as an immutable dir:
    // two for corpus A (both kept after the repoint) + one for corpus B
    import scala.jdk.CollectionConverters._
    val versions = java.nio.file.Files.walk(
        java.nio.file.Paths.get(durableRoot)).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("v_")).toSeq
    assert(versions.size === 3)
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

  test("prune: keep-last-N retention drops old versions, never the " +
      "CURRENT target; a dangling CURRENT pointer recomputes instead of " +
      "surfacing a parquet path error") {
    val root = TestSpark.tmpDir("graft-prune-artifacts")
    val corpus = TestSpark.tmpDir("prune-corpus")
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.artifactRoot", root)
    import s1.implicits._
    for (i <- 1 to 4)
      ArtifactStore.publish(s1, "lbl", corpus)(
        Seq((i.toLong, i.toLong * 10)).toDF("v", "c"))
    def versions(): Seq[java.nio.file.Path] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("v_")).toSeq
    }
    assert(versions().size === 4)
    // keep the newest 2 of 4: the two oldest version dirs go
    assert(ArtifactStore.prune(s1, "lbl", corpus, keep = 2) === 2)
    assert(versions().size === 2)
    // CURRENT survives and still resolves to the latest publish
    val cur = ArtifactStore.readOrCompute(s1, "lbl", corpus) {
      fail("compute thunk invoked — CURRENT should have survived prune")
    }.collect()
    assert(cur.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((4L, 40L)))
    // pruning again is a no-op (both survivors are inside the window)
    assert(ArtifactStore.prune(s1, "lbl", corpus, keep = 2) === 0)
    // dangling pointer (an out-of-band sweep deleted the version dirs
    // but left CURRENT): readOrCompute must recompute + republish, not
    // throw an opaque path error
    versions().foreach { p =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    val recomputed = ArtifactStore.readOrCompute(s1, "lbl", corpus)(
      Seq((9L, 90L)).toDF("v", "c")).collect()
    assert(recomputed.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((9L, 90L)))
    assert(versions().size === 1)
  }

  test("prune orders by version NAME (epoch-nanos), not mtime: a " +
      "filesystem copy/restore that rewrites mtimes cannot make " +
      "retention keep stale versions over newer ones") {
    val root = TestSpark.tmpDir("graft-prune-mtime")
    val corpus = TestSpark.tmpDir("prune-mtime-corpus")
    val s1 = spark.newSession()
    s1.conf.set("spark.graft.artifactRoot", root)
    import s1.implicits._
    for (i <- 1 to 3)
      ArtifactStore.publish(s1, "lbl", corpus)(
        Seq((i.toLong, i.toLong * 10)).toDF("v", "c"))
    def versionDirs(): Seq[java.io.File] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("v_"))
        .map(_.toFile).toSeq
    }
    val byName = versionDirs().sortBy(_.getName)
    assert(byName.size === 3)
    // simulate a restore that stamped the OLDEST version with the newest
    // mtime — an mtime-ordered prune would retain it and delete genuinely
    // newer versions
    assert(byName.head.setLastModified(System.currentTimeMillis + 3600000L))
    assert(ArtifactStore.prune(s1, "lbl", corpus, keep = 1) === 2)
    val survivors = versionDirs().map(_.getName)
    assert(survivors === Seq(byName.last.getName),
      s"name-order retention must keep the newest-named version: $survivors")
    val cur = ArtifactStore.readOrCompute(s1, "lbl", corpus) {
      fail("compute thunk invoked — CURRENT should have survived prune")
    }.collect()
    assert(cur.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 30L)))
  }
}
