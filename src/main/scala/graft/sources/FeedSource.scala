package graft.sources

import java.io.IOException
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The feed-acquisition seam — the one reference capability
  * (bq_nvd/download.py:32-54, driven at bq-nvd.py:106-114) that had no
  * analogue here: resolving a feed NAME ("recent", "modified", "2019")
  * to its published URL, fetching it to a local staging path, and
  * failing loudly on a truncated transfer.
  *
  * The reference hard-wires `urllib.request.urlretrieve` and surfaces
  * `ContentTooShortError`; here the transport is a [[FeedFetcher]]
  * strategy so the name/URL arithmetic and the truncation contract are
  * unit-testable without network (this sandbox has none), and a
  * deployment can drop in HTTP, a mirror directory, or a distributed
  * object-store copy without touching the ETL. Everything downstream of
  * [[FeedSource.download]] is the existing Spark-first pipeline
  * ([[NvdEtl.ingest]] onward).
  */
trait FeedFetcher {

  /** Copy the resource at `url` to `dest`; return (bytesWritten,
    * declaredLength) where declaredLength is the transport's own claim
    * (Content-Length, object size) when it makes one. The TRUNCATION
    * decision deliberately lives in [[FeedSource]], not in fetchers —
    * every transport gets the same contract for free.
    */
  def fetch(url: String, dest: Path): (Long, Option[Long])
}

/** `file://`-style fetcher: "fetches" from a local mirror directory —
  * the sandbox/deployment-bootstrap transport (NVD publishes rsync'able
  * mirrors), and the one the specs drive end-to-end over the committed
  * feed fixtures.
  */
final class LocalMirrorFetcher(mirrorDir: String) extends FeedFetcher {
  def fetch(url: String, dest: Path): (Long, Option[Long]) = {
    val name = url.substring(url.lastIndexOf('/') + 1)
    val src = Paths.get(mirrorDir).resolve(name)
    if (!Files.exists(src))
      throw new IOException(s"feed not in mirror: $src")
    Files.createDirectories(dest.getParent)
    Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
    (Files.size(dest), Some(Files.size(src)))
  }
}

/** Plain-JDK HTTP(S) fetcher — the deployment transport, mirroring the
  * reference's urlretrieve. Untestable in this zero-egress sandbox, so
  * it stays a thin streaming copy with zero logic of its own: the
  * truncation check it feeds IS tested, via fake fetchers.
  */
object HttpFeedFetcher extends FeedFetcher {
  def fetch(url: String, dest: Path): (Long, Option[Long]) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
    val declared = conn.getContentLengthLong match {
      case n if n >= 0 => Some(n)
      case _           => None
    }
    Files.createDirectories(dest.getParent)
    val in = conn.getInputStream
    try {
      val written = Files.copy(in, dest, StandardCopyOption.REPLACE_EXISTING)
      (written, declared)
    } finally in.close()
  }
}

/** Raised when a transfer delivers fewer/more bytes than the transport
  * declared — the analogue of urllib's ContentTooShortError
  * (download.py:49-51): a partial feed must never reach the parser,
  * where it would either abort a strict load or silently contribute a
  * truncated CVE set.
  */
final class TruncatedFeedException(val url: String, val got: Long,
    val declared: Long)
  extends IOException(
    s"truncated feed transfer: $url declared $declared bytes, got $got")

/** Feed-name → URL arithmetic + staging, reference config.yml defaults.
  *
  * The reference's own docstring calls the scheme brittle ("If NVD
  * changes their file naming scheme or URL this will break") — hence
  * every component is a constructor parameter and the resolver is
  * spec'd, so a scheme change is a one-line config edit caught by
  * tests, not a silent 404 in a cron loop.
  */
final case class FeedSource(
    urlBase: String = FeedSource.DefaultUrlBase,
    filePrefix: String = FeedSource.DefaultFilePrefix,
    fileSuffix: String = FeedSource.DefaultFileSuffix,
    fetcher: FeedFetcher = HttpFeedFetcher) {

  /** download.py:47 — the desired file name goes between prefix and
    * suffix: "recent" → "nvdcve-1.1-recent.json.gz".
    */
  def feedFileName(name: String): String = filePrefix + name + fileSuffix

  /** download.py:48 — url_base + filename. */
  def feedUrl(name: String): String = urlBase + feedFileName(name)

  /** Fetch feed `name` into `localDir`, enforcing the truncation
    * contract; returns the staged file's absolute path (download.py's
    * return shape, localPath + filename).
    *
    * Transient-transport retry mirrors the reference's 3-try loop
    * (etl.py:138-154: "from time to time the GCS upload will fail, so
    * to be safe we'll retry 3 times" — the last reference behavior
    * without a mirror): an IOException from the fetcher retries up to
    * [[FeedSource.MaxFetchAttempts]] total attempts before the final
    * failure raises through. A [[TruncatedFeedException]] is NOT
    * transient — it is the data-integrity contract and raises
    * immediately (the reference's ContentTooShortError path likewise
    * aborts, download.py:50-54; only the transport retries).
    */
  def download(name: String, localDir: String): String = {
    val dest = Paths.get(localDir).resolve(feedFileName(name)).toAbsolutePath
    var attempt = 1
    var fetched: Option[(Long, Option[Long])] = None
    while (fetched.isEmpty) {
      try fetched = Some(fetcher.fetch(feedUrl(name), dest))
      catch {
        // TruncatedFeedException extends IOException, so without this
        // guard a fetcher that detects truncation internally would be
        // silently retried as a transient transport error — the
        // integrity contract must raise through on the FIRST sighting
        // no matter where it is thrown from.
        case t: TruncatedFeedException =>
          Files.deleteIfExists(dest)
          throw t
        case e: java.io.IOException =>
          Files.deleteIfExists(dest) // never leave a poisoned staging file
          if (attempt >= FeedSource.MaxFetchAttempts) throw e
          attempt += 1
      }
    }
    val (got, declared) = fetched.get
    declared.filter(_ != got).foreach { d =>
      Files.deleteIfExists(dest)
      throw new TruncatedFeedException(feedUrl(name), got, d)
    }
    dest.toString
  }

  /** Step-1+2 of the reference run loop (bq-nvd.py:106-121): download
    * then parse — staged file straight into the declarative gz-JSON
    * ingest; everything after is the shared Spark pipeline.
    */
  def ingestFeed(spark: SparkSession, name: String, localDir: String,
      schemaPath: String = NvdEtl.DefaultSchemaPath,
      strict: Boolean = false): DataFrame =
    NvdEtl.ingest(spark, download(name, localDir), schemaPath, strict)

  /** The acquisition half of the reference's cron loop
    * (cronjob.yml → download → load), feeding the streaming half
    * ([[graft.streaming.StreamOps.nvdFeedStream]]): fetch each named
    * feed into the stream's WATCH directory. Each file stages under a
    * dot-prefixed temp name and then renames into place — a file-watch
    * source lists completed names only, so the stream can never ingest
    * a half-written gz (dot-files are invisible to Spark's file index).
    * Returns the staged paths in input order.
    */
  def stageAll(names: Seq[String], watchDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(watchDir))
    names.map { name =>
      val tmpDir = Files.createTempDirectory("graft-feed-stage")
      val fetched = Paths.get(download(name, tmpDir.toString))
      val dest = Paths.get(watchDir).resolve(feedFileName(name))
      val hidden = dest.resolveSibling("." + dest.getFileName.toString)
      // first hop may cross filesystems (temp → watch volume): plain
      // replace; second hop is same-directory, so the rename is atomic
      Files.move(fetched, hidden, StandardCopyOption.REPLACE_EXISTING)
      Files.deleteIfExists(tmpDir) // cron loop: never leak a dir per feed
      Files.deleteIfExists(dest)
      Files.move(hidden, dest, StandardCopyOption.ATOMIC_MOVE)
      dest.toString
    }
  }
}

object FeedSource {
  /** Total fetch attempts before a transient transport failure raises
    * (the reference's `try_count < 3` loop, etl.py:138-154).
    */
  val MaxFetchAttempts = 3

  /** Reference config.yml `url_base`. */
  val DefaultUrlBase = "https://nvd.nist.gov/feeds/json/cve/1.1/"

  /** Reference config.yml `file_prefix`. */
  val DefaultFilePrefix = "nvdcve-1.1-"

  /** Reference config.yml `file_suffix`. */
  val DefaultFileSuffix = ".json.gz"

  private val ConfigKeys = Seq("url_base", "file_prefix", "file_suffix")

  /** Parse the flat `key: 'value'` subset of YAML the reference's
    * config.yml actually uses (bq-nvd.py:43-47 yaml.safe_load of a flat
    * mapping; comments, blank lines, single/double-quoted scalars). NOT
    * a YAML library (deps are frozen) — nesting, lists, and multi-line
    * scalars are out of scope and simply won't match the `k: v` shape.
    */
  def parseFlatYaml(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains(':'))
      .map { l =>
        val i = l.indexOf(':')
        val k = l.substring(0, i).trim
        val raw = l.substring(i + 1).trim
        val unq =
          if (raw.length >= 2 &&
              ((raw.head == '\'' && raw.last == '\'') ||
               (raw.head == '"' && raw.last == '"')))
            raw.substring(1, raw.length - 1)
          else raw
        k -> unq
      }
      .toMap

  /** Build a [[FeedSource]] the way the reference builds its config
    * (bq-nvd.py:29-47): if EVERY key is present as an environment
    * variable, the env wins wholesale; otherwise the yaml file is loaded
    * and IT wins wholesale (the reference discards partial env sets —
    * mirrored exactly, quirk and all). Keys absent from both fall back
    * to the published defaults. Only the three feed-naming keys exist
    * here — project/dataset/bucket are BigQuery/GCS glue with no
    * Spark-native meaning.
    */
  def fromConfig(configPath: String,
      env: Map[String, String] = sys.env,
      fetcher: FeedFetcher = HttpFeedFetcher): FeedSource = {
    val cfg =
      if (ConfigKeys.forall(env.contains)) env
      else parseFlatYaml(new String(
        Files.readAllBytes(Paths.get(configPath)),
        java.nio.charset.StandardCharsets.UTF_8))
    FeedSource(
      urlBase = cfg.getOrElse("url_base", DefaultUrlBase),
      filePrefix = cfg.getOrElse("file_prefix", DefaultFilePrefix),
      fileSuffix = cfg.getOrElse("file_suffix", DefaultFileSuffix),
      fetcher = fetcher)
  }
}
