package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Gates for the feed-acquisition seam (SURVEY §2.1 nvd_run's step 1):
  * name→URL arithmetic against the reference's published examples,
  * staging, the truncation contract, and download→ingest end-to-end
  * over the committed fixture via a local mirror — all without network,
  * which is the point of the [[FeedFetcher]] seam.
  */
class FeedSourceSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-feed").toString

  test("feed name resolves between prefix and suffix to the documented URLs") {
    val fs = FeedSource()
    // the two example URLs in download.py's own docstring (:8-10)
    assert(fs.feedUrl("2019") ===
      "https://nvd.nist.gov/feeds/json/cve/1.1/nvdcve-1.1-2019.json.gz")
    assert(fs.feedUrl("recent") ===
      "https://nvd.nist.gov/feeds/json/cve/1.1/nvdcve-1.1-recent.json.gz")
    assert(fs.feedFileName("modified") === "nvdcve-1.1-modified.json.gz")
    // the brittleness hedge: every component is config, not constant
    val alt = FeedSource(urlBase = "https://mirror.example/v2/",
      filePrefix = "nvdcve-2.0-", fileSuffix = ".json.zst")
    assert(alt.feedUrl("2024") ===
      "https://mirror.example/v2/nvdcve-2.0-2024.json.zst")
  }

  test("download stages the feed under its canonical filename") {
    val mirror = tmpDir()
    val bytes = "feed-bytes".getBytes
    Files.write(Paths.get(mirror).resolve("nvdcve-1.1-recent.json.gz"), bytes)
    val stage = tmpDir()
    val fs = FeedSource(fetcher = new LocalMirrorFetcher(mirror))
    val staged = fs.download("recent", stage)
    assert(staged === s"$stage/nvdcve-1.1-recent.json.gz")
    assert(Files.readAllBytes(Paths.get(staged)).sameElements(bytes))
  }

  test("truncated transfer raises and removes the poisoned staging file") {
    val lying = new FeedFetcher {
      def fetch(url: String, dest: Path): (Long, Option[Long]) = {
        Files.write(dest, Array.fill[Byte](10)(1))
        (10L, Some(9999L)) // transport declared more than it delivered
      }
    }
    val stage = tmpDir()
    val fs = FeedSource(fetcher = lying)
    val e = intercept[TruncatedFeedException](fs.download("modified", stage))
    assert(e.got === 10L && e.declared === 9999L)
    assert(e.url.endsWith("nvdcve-1.1-modified.json.gz"))
    assert(!Files.exists(Paths.get(stage).resolve("nvdcve-1.1-modified.json.gz")))
  }

  test("an honest unknown-length transfer passes (no declared size, no check)") {
    val chunked = new FeedFetcher {
      def fetch(url: String, dest: Path): (Long, Option[Long]) = {
        Files.write(dest, Array.fill[Byte](7)(2))
        (7L, None)
      }
    }
    val staged = FeedSource(fetcher = chunked).download("recent", tmpDir())
    assert(Files.size(Paths.get(staged)) === 7L)
  }

  test("stageAll feeds the streaming watch dir: acquisition → stream ingest, deduped") {
    // the reference cron loop composed end to end: FeedSource acquires
    // both overlapping feeds into the watch dir, nvdFeedStream parses
    // and id-dedups them — the staged names are the canonical feed names
    val mirror = tmpDir()
    Files.copy(Paths.get(NvdEtl.FixtureAbsPath),
      Paths.get(mirror).resolve("nvdcve-1.1-2024.json.gz"))
    Files.copy(Paths.get(NvdEtl.RecentFixtureAbsPath),
      Paths.get(mirror).resolve("nvdcve-1.1-recent.json.gz"))
    val watch = tmpDir()
    val staged = FeedSource(fetcher = new LocalMirrorFetcher(mirror))
      .stageAll(Seq("2024", "recent"), watch)
    assert(staged === Seq(s"$watch/nvdcve-1.1-2024.json.gz",
      s"$watch/nvdcve-1.1-recent.json.gz"))
    val spark = TestSpark.spark
    val q = graft.streaming.StreamOps.nvdFeedStream(spark, watch)
      .select(org.apache.spark.sql.functions.col("cve_id"))
      .writeStream.format("memory").queryName("feed_stage_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("feed_stage_stream")
      assert(ids.count() === 120) // 96 bootstrap + 24 unseen recent
      assert(ids.distinct().count() === 120)
    } finally q.stop()
  }

  test("download → ingest end-to-end over the committed fixture mirror") {
    // the fixture gz IS a valid recent-feed payload; a mirror dir serving
    // it under the canonical name exercises the full step-1+2 path
    val mirror = tmpDir()
    Files.copy(Paths.get(NvdEtl.FixtureAbsPath),
      Paths.get(mirror).resolve("nvdcve-1.1-recent.json.gz"))
    val fs = FeedSource(fetcher = new LocalMirrorFetcher(mirror))
    val df = fs.ingestFeed(TestSpark.spark, "recent", tmpDir())
    assert(df.count() === 96)
    assert(df.schema === NvdEtl.itemSchema())
  }
}
