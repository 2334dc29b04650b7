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

  // ---- HttpFeedFetcher over a loopback server (zero egress): the last
  // untested reference behavior — download.py:32-54 over real HTTP.

  test("HttpFeedFetcher: loopback server → fetch → ingest end-to-end") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val bytes = Files.readAllBytes(Paths.get(NvdEtl.FixtureAbsPath))
    server.createContext("/feeds/", { exchange =>
      assert(exchange.getRequestURI.getPath
        === "/feeds/nvdcve-1.1-recent.json.gz")
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      val os = exchange.getResponseBody
      os.write(bytes); os.close()
    })
    server.start()
    try {
      val fs = FeedSource(
        urlBase = s"http://127.0.0.1:${server.getAddress.getPort}/feeds/",
        fetcher = HttpFeedFetcher)
      val df = fs.ingestFeed(TestSpark.spark, "recent", tmpDir())
      assert(df.count() === 96)
    } finally server.stop(0)
  }

  test("HttpFeedFetcher: Content-Length mismatch raises through the real HTTP path") {
    // com.sun.net.httpserver enforces its own framing, so the lying
    // transport is a raw socket: declare 9999 bytes, deliver 10, close.
    // HttpURLConnection surfaces the short body as a silent EOF (no
    // exception), which is exactly the hole the truncation contract
    // closes — the same hole urlretrieve's ContentTooShortError covers.
    val ss = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val serve = new Thread(() => {
      val s = ss.accept()
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream))
        var line = in.readLine()
        while (line != null && line.nonEmpty) line = in.readLine()
        val os = s.getOutputStream
        os.write("HTTP/1.1 200 OK\r\nContent-Length: 9999\r\n\r\n".getBytes)
        os.write(Array.fill[Byte](10)(1))
        os.flush()
      } finally s.close()
    })
    serve.start()
    try {
      val stage = tmpDir()
      val fs = FeedSource(
        urlBase = s"http://127.0.0.1:${ss.getLocalPort}/",
        fetcher = HttpFeedFetcher)
      val e = intercept[TruncatedFeedException](fs.download("modified", stage))
      assert(e.got === 10L && e.declared === 9999L)
      assert(!Files.exists(
        Paths.get(stage).resolve("nvdcve-1.1-modified.json.gz")))
    } finally { serve.join(10000); ss.close() }
  }

  test("HttpFeedFetcher: chunked transfer (no Content-Length) passes unchecked") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      exchange.sendResponseHeaders(200, 0) // 0 = chunked: no declared size
      val os = exchange.getResponseBody
      os.write(Array.fill[Byte](7)(2)); os.close()
    })
    server.start()
    try {
      val fs = FeedSource(
        urlBase = s"http://127.0.0.1:${server.getAddress.getPort}/",
        fetcher = HttpFeedFetcher)
      val staged = fs.download("recent", tmpDir())
      assert(Files.size(Paths.get(staged)) === 7L)
    } finally server.stop(0)
  }

  // ---- Config-file seam: the reference's config.yml → FeedSource
  // (bq-nvd.py:29-47; flat-YAML subset, env-wholesale-override quirk).

  test("fromConfig round-trips the reference's own config.yml values") {
    val fs = FeedSource.fromConfig("fixtures/nvd/config.yml",
      env = Map.empty)
    assert(fs.urlBase === FeedSource.DefaultUrlBase)
    assert(fs.filePrefix === FeedSource.DefaultFilePrefix)
    assert(fs.fileSuffix === FeedSource.DefaultFileSuffix)
    assert(fs.feedUrl("recent") ===
      "https://nvd.nist.gov/feeds/json/cve/1.1/nvdcve-1.1-recent.json.gz")
  }

  test("fromConfig: custom yaml values, quoting styles, comments, extra keys") {
    val cfg = tmpDir() + "/config.yml"
    Files.write(Paths.get(cfg),
      """# mirror deployment
        |url_base: "https://mirror.example/v2/"
        |
        |file_prefix: nvdcve-2.0-
        |file_suffix: '.json.zst'
        |bucket_name: 'ignored-cloud-glue'
        |""".stripMargin.getBytes)
    val fs = FeedSource.fromConfig(cfg, env = Map.empty)
    assert(fs.feedUrl("2024") ===
      "https://mirror.example/v2/nvdcve-2.0-2024.json.zst")
  }

  test("fromConfig: complete env set wins wholesale; partial env is discarded") {
    val cfg = tmpDir() + "/config.yml"
    Files.write(Paths.get(cfg),
      "url_base: 'https://yaml.example/'\nfile_prefix: 'yaml-'\nfile_suffix: '.gz'\n".getBytes)
    val full = Map("url_base" -> "https://env.example/",
      "file_prefix" -> "env-", "file_suffix" -> ".env.gz")
    assert(FeedSource.fromConfig(cfg, env = full).feedUrl("x")
      === "https://env.example/env-x.env.gz")
    // the reference's quirk, mirrored: ANY missing env key ⇒ yaml wins
    // wholesale, the partial env values are NOT merged (bq-nvd.py:36-47)
    val partial = Map("url_base" -> "https://env.example/")
    assert(FeedSource.fromConfig(cfg, env = partial).feedUrl("x")
      === "https://yaml.example/yaml-x.gz")
  }

  // ---- transient-transport retry (etl.py:138-154's 3-try loop)

  /** Loopback server failing the first `failures` requests with 500,
    * then serving `bytes`; counts requests.
    */
  private def flakyServer(failures: Int, bytes: Array[Byte]) = {
    val count = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feeds/", { exchange =>
      if (count.incrementAndGet() <= failures) {
        exchange.sendResponseHeaders(500, -1)
        exchange.close()
      } else {
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        val os = exchange.getResponseBody
        os.write(bytes); os.close()
      }
    })
    server.start()
    (server, count)
  }

  test("download retries a flaky transport and succeeds on attempt 3 " +
      "(reference etl.py:138-154)") {
    val bytes = "feed-bytes".getBytes
    val (server, count) = flakyServer(failures = 2, bytes)
    try {
      val fs = FeedSource(
        urlBase = s"http://127.0.0.1:${server.getAddress.getPort}/feeds/",
        fetcher = HttpFeedFetcher)
      val staged = fs.download("recent", tmpDir())
      assert(Files.readAllBytes(Paths.get(staged)).sameElements(bytes))
      assert(count.get() === 3)
    } finally server.stop(0)
  }

  test("download raises after MaxFetchAttempts transport failures, " +
      "staging nothing") {
    val (server, count) = flakyServer(failures = 99, "x".getBytes)
    try {
      val fs = FeedSource(
        urlBase = s"http://127.0.0.1:${server.getAddress.getPort}/feeds/",
        fetcher = HttpFeedFetcher)
      val stage = tmpDir()
      intercept[java.io.IOException](fs.download("recent", stage))
      assert(count.get() === FeedSource.MaxFetchAttempts)
      assert(!Files.exists(
        Paths.get(stage).resolve("nvdcve-1.1-recent.json.gz")))
    } finally server.stop(0)
  }

  test("truncation is NOT transient: it raises through without a retry") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val lying = new FeedFetcher {
      def fetch(url: String, dest: Path): (Long, Option[Long]) = {
        calls.incrementAndGet()
        Files.write(dest, Array.fill[Byte](10)(1))
        (10L, Some(9999L))
      }
    }
    val fs = FeedSource(fetcher = lying)
    intercept[TruncatedFeedException](fs.download("modified", tmpDir()))
    assert(calls.get() === 1)
  }
}
