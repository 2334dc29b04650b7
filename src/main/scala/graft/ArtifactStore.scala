package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse for derived LABELING artifacts (SURVEY §2.2 / §2.3) — the
  * stored-index contract (sim_ivf_incremental's centroid table,
  * dedup_incremental_minhash's band index) extended to cluster
  * labelings: a pipeline query COMPUTES a labeling once and publishes
  * it as a parquet relation; evaluation queries READ the stored
  * relation instead of re-running the clustering they grade, and
  * "stored ≡ recompute" is exactly what the oracle gate checks (the
  * evaluation query's oracle SQL recomputes the labeling from scratch —
  * a stale or divergent artifact hash-mismatches).
  *
  * Layout and durability (r11 verdict #4): the root is
  * `spark.graft.artifactRoot` when set — a durable warehouse path that
  * SURVIVES the session, so a labeling written by one session is read,
  * not recomputed, by the next (ArtifactStoreSpec's cold-session gate) —
  * and a fresh per-JVM temp directory otherwise (artifacts then die
  * with the JVM, which is the safe default under code churn). Corpora
  * are keyed by a hash of the NORMALIZED ABSOLUTE corpus path, so two
  * corpus dirs sharing a basename (/a/sf0.01 vs /b/sf0.01) can never
  * alias to one artifact. Every publish writes an immutable
  * `v_<nanos>` subdirectory and then atomically swaps the `CURRENT`
  * pointer file — a reader resolves the pointer to a version dir that
  * is never mutated afterwards, so concurrent or cross-session readers
  * can never observe a half-written overwrite (the in-place
  * mode("overwrite") this replaces could delete files under a lazy
  * reader's scan).
  */
object ArtifactStore {
  private lazy val defaultRoot: String =
    Files.createTempDirectory("graft-artifacts").toString

  private def root(spark: SparkSession): String =
    spark.conf.get("spark.graft.artifactRoot", defaultRoot)

  private def corpusKey(dir: String): String = {
    val norm = Paths.get(dir).toAbsolutePath.normalize.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(UTF_8)).take(8)
      .map("%02x".format(_)).mkString
  }

  private def keyDir(spark: SparkSession, key: String, dir: String): Path =
    Paths.get(root(spark), corpusKey(dir), key)

  /** The version dir CURRENT points at, if a published version exists. */
  private def current(kd: Path): Option[Path] = {
    val cur = kd.resolve("CURRENT")
    if (Files.exists(cur))
      Some(kd.resolve(new String(Files.readAllBytes(cur), UTF_8).trim))
    else None
  }

  /** Write `df` as a new immutable version and atomically repoint
    * CURRENT at it; returns the version dir. Old versions are left in
    * place (readers may still hold them) — retention is the warehouse
    * owner's policy, mirroring Warehouse.retention.
    */
  private def writeVersion(kd: Path, df: DataFrame): Path = {
    Files.createDirectories(kd)
    val v = s"v_${System.nanoTime()}"
    val target = kd.resolve(v)
    df.write.mode("errorifexists").parquet(target.toString)
    val tmp = kd.resolve(s".CURRENT.$v.tmp")
    Files.write(tmp, v.getBytes(UTF_8))
    Files.move(tmp, kd.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    target
  }

  /** Compute `df` and publish it as a new version of artifact `key` for
    * corpus `dir`, returning the stored relation — the PIPELINE side:
    * the publishing query always pays its own compute, so its benchmark
    * time stays the honest cost of the operator plus the
    * materialization.
    */
  def publish(spark: SparkSession, key: String, dir: String)(
      df: => DataFrame): DataFrame = synchronized {
    spark.read.parquet(writeVersion(keyDir(spark, key, dir), df).toString)
  }

  /** Read the CURRENT version of artifact `key` for corpus `dir`,
    * computing and publishing one first on miss — the EVALUATION side:
    * when the pipeline query already ran (this session or, under a
    * durable root, any previous one) the labeling is a parquet scan; on
    * a cold store the evaluation is self-contained and pays the compute
    * exactly once.
    */
  def readOrCompute(spark: SparkSession, key: String, dir: String)(
      compute: => DataFrame): DataFrame = synchronized {
    val kd = keyDir(spark, key, dir)
    val p = current(kd).getOrElse(writeVersion(kd, compute))
    spark.read.parquet(p.toString)
  }
}
