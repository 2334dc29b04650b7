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
    GraftSession.scratchDir("graft-artifacts")

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

  /** The version dir CURRENT points at, if a published version exists
    * AND its directory is still on disk: under a durable root a
    * retention sweep (or an out-of-band delete) can orphan the pointer,
    * and resolving it anyway would surface as an opaque parquet path
    * error in the reader — a dangling pointer instead reads as "no
    * version", so readOrCompute recomputes and republishes.
    */
  private def current(kd: Path): Option[Path] = {
    val cur = kd.resolve("CURRENT")
    if (Files.exists(cur)) {
      val v = kd.resolve(new String(Files.readAllBytes(cur), UTF_8).trim)
      if (Files.isDirectory(v)) Some(v) else None
    } else None
  }

  /** Write `df` as a new immutable version and atomically repoint
    * CURRENT at it; returns the version dir. Old versions are left in
    * place (readers may still hold them) — [[prune]] is the retention
    * API, mirroring Warehouse.retain. Version names are a zero-padded
    * EPOCH-nanos timestamp (wall clock, not nanoTime: CLOCK_MONOTONIC
    * resets at reboot and has no cross-JVM meaning, so a nanoTime name
    * published after a reboot would sort BELOW every pre-reboot version
    * and retention-by-name would delete the newest artifacts) — so
    * lexicographic name order IS publish order across sessions and
    * reboots, and survives a filesystem copy/restore of the artifact
    * root, which directory mtimes do not. A random suffix follows: the
    * wall clock has no cross-JVM uniqueness guarantee, and two sessions
    * publishing in the same nanosecond must never collide into one
    * directory (errorifexists would at least be loud, the suffix makes
    * it a non-event).
    */
  private def writeVersion(kd: Path, df: DataFrame): Path = {
    Files.createDirectories(kd)
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val now = java.time.Instant.now()
    val epochNanos = now.getEpochSecond * 1000000000L + now.getNano
    val v = f"v_$epochNanos%019d_$suffix"
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

  /** Retention: keep the newest `keep` versions of artifact `key` for
    * corpus `dir` — by version NAME: names are zero-padded epoch nanos
    * (see writeVersion), so lexicographic order is publish order across
    * sessions and reboots, and — unlike directory mtimes, which a
    * filesystem copy/restore of the artifact root rewrites — the name
    * travels with the artifact. NEVER deletes the CURRENT target
    * even if it falls outside the window
    * (a concurrent publisher may have repointed since we listed).
    * Returns the number of version dirs deleted. A reader still holding
    * an old version's path owns its lifetime — the same contract as
    * Warehouse.compact's swap (readers re-resolve CURRENT per read).
    * Under a daily-cron pipeline (the reference's cadence,
    * bq-nvd/cronjob.yml) this bounds the store at `keep` labeling
    * copies instead of one per day forever.
    *
    * Two ordering caveats the name scheme carries (r14 advice):
    * (a) LEGACY COEXISTENCE — a durable root written before the
    * epoch-nanos scheme holds `v_<System.nanoTime>` names (JVM uptime
    * nanos). Those sort BELOW every epoch-nanos name only because host
    * uptime ≪ 56 years (uptime nanos < 2^62 ≈ epoch nanos of 1971+);
    * that assumption is stated here rather than silently relied on, and
    * it errs SAFE: legacy versions age out first, and CURRENT is never
    * deleted regardless of order. (b) CLOCK STEPS — a backward
    * wall-clock correction (NTP step) between two publishes can invert
    * name order where mtime order would not. Retention tolerates this
    * because versions are published at daily cadence (cronjob.yml) and
    * NTP steps are sub-second-to-seconds scale: an inversion would need
    * two publishes inside one clock-step window, and even then the
    * CURRENT pointer — not the name order — decides what readers see.
    */
  def prune(spark: SparkSession, key: String, dir: String,
      keep: Int): Int = synchronized {
    require(keep >= 1, s"prune must keep at least the CURRENT version: $keep")
    val kd = keyDir(spark, key, dir)
    if (!Files.isDirectory(kd)) return 0
    val cur = current(kd).map(_.getFileName.toString)
    val versions = kd.toFile.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v_"))
      .sortBy(_.getName)(Ordering[String].reverse)
    val drop = versions.drop(keep).filterNot(f => cur.contains(f.getName))
    drop.foreach(deleteRecursively)
    drop.length
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    Files.delete(f.toPath)
  }
}
