package graft

import graft.sources.ApiEnrich
import org.apache.spark.sql.functions._

/** The API-enrichment plumbing: per-partition client lifecycle, retry on
  * transient failure, rate limiting, miss defaulting. Value-level
  * correctness of the full output is the enrich_api oracle row.
  */
class ApiEnrichSpec extends SparkSpec {

  test("enrich_api: misses default to Unknown, hits carry the stub title") {
    val df = ApiEnrich.enrichViaApi(spark, sfDir).cache()
    val misses = df.filter(col("title") === "Unknown")
    val hits = df.filter(col("title") =!= "Unknown")
    assert(misses.count() > 0, "stub should miss ~10% of keys")
    assert(hits.count() > misses.count())
    assert(hits.filter(col("title") === concat(lit("T-"), substring(col("doi"), 1, 8))).count()
      == hits.count())
  }

  test("transient failures are retried, not surfaced (deterministic subset throws once)") {
    // The stub throws once per client instance for keys % 211 == 0; the
    // per-row retry loop must absorb those within the same task, so the
    // row count survives intact across however many partitions run.
    val df = ApiEnrich.enrichViaApi(spark, sfDir)
    assert(df.count() == Tables.orders(spark, sfDir).count())
  }

  test("a client that always fails propagates after maxAttempts") {
    val alwaysFail = () => new ApiEnrich.MetadataClient {
      override def fetch(doi: String): Option[String] =
        throw new java.io.IOException("permanent outage")
    }
    val ex = intercept[Exception] {
      ApiEnrich.enrichViaApi(spark, sfDir, newClient = alwaysFail, maxAttempts = 2).count()
    }
    assert(ex.getMessage != null)
  }

  test("rate limiter spaces acquisitions") {
    val limiter = new ApiEnrich.RateLimiter(perSecond = 1000)
    val t0 = System.nanoTime()
    (1 to 50).foreach(_ => limiter.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // 50 acquisitions at 1000/s ≥ ~49 ms of pacing.
    assert(elapsedMs >= 40, s"limiter let 50 calls through in ${elapsedMs}ms")
  }

  // -----------------------------------------------------------------
  // HTTP transport: an in-process fixture (loopback only, no egress)
  // that speaks the stub's semantics over real HTTP — 404 for the
  // key%10 miss class, one 429 (with Retry-After) per key%211 key,
  // 200 "T-<doi8>" otherwise — so the conf-selected HttpMetadataClient
  // is proven EQUIVALENT to the shipped stub on every code path.
  // -----------------------------------------------------------------

  /** Loopback HTTP server mirroring StubMetadataClient's contract. */
  private def withFixture[T](body: String => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen429 = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    server.createContext("/meta", { exchange =>
      val doi = exchange.getRequestURI.getPath.stripPrefix("/meta/")
      val key = java.lang.Long.parseLong(doi.takeRight(6), 16)
      def send(code: Int, bodyStr: String): Unit = {
        val bytes = bodyStr.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) exchange.getResponseBody.write(bytes)
        exchange.close()
      }
      if (key % 211 == 0 && seen429.add(doi)) {
        exchange.getResponseHeaders.set("Retry-After", "0")
        send(429, "")
      } else if (key % 10 == 0) send(404, "")
      else send(200, "T-" + doi.take(8))
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/meta")
    finally server.stop(0)
  }

  test("http transport parity: the real client over the loopback fixture " +
      "produces exactly the stub transport's rows") {
    withFixture { base =>
      val viaHttp = ApiEnrich.enrichViaApi(spark, sfDir,
          newClient = () => new ApiEnrich.HttpMetadataClient(base))
        .collect().map(_.toString).sorted.toSeq
      val viaStub = ApiEnrich.enrichViaApi(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(viaHttp == viaStub,
        "transport swap changed results: " +
          viaHttp.diff(viaStub).take(3) + " vs " + viaStub.diff(viaHttp).take(3))
      // non-vacuous: the fixture actually served the 429-retry path
      assert(viaHttp.nonEmpty)
    }
  }

  test("conf selection: spark.graft.api.transport=http wires the real " +
      "client; default stays the stub") {
    withFixture { base =>
      spark.conf.set("spark.graft.api.transport", "http")
      spark.conf.set("spark.graft.api.baseUrl", base)
      try {
        val viaConf = ApiEnrich.enrichViaApi(spark, sfDir,
            ApiEnrich.clientFactory(spark))
          .agg(count(lit(1))).collect()(0).getLong(0)
        assert(viaConf == Tables.orders(spark, sfDir).count())
      } finally {
        spark.conf.unset("spark.graft.api.transport")
        spark.conf.unset("spark.graft.api.baseUrl")
      }
      // default (no conf): factory must hand back the stub
      assert(ApiEnrich.clientFactory(spark)()
        .isInstanceOf[ApiEnrich.StubMetadataClient])
    }
  }

  test("http status classing matches the reference: only 429/5xx are " +
      "transient; other 4xx are permanent misses (api.py:54-61)") {
    // one-off server that answers with the status encoded in the path,
    // counting hits so the no-retry property is observable
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/st", { exchange =>
      val code = exchange.getRequestURI.getPath.stripPrefix("/st/").toInt
      hits.merge(code.toString, 1, (a, b) => a + b)
      if (code == 429 || code >= 500)
        exchange.getResponseHeaders.set("Retry-After", "0")
      exchange.sendResponseHeaders(code, -1)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/st"
      val client = new ApiEnrich.HttpMetadataClient(base)
      // permanent-miss class: returns None on the FIRST response
      for (code <- Seq(403, 404, 410)) {
        assert(client.fetch(code.toString).isEmpty, s"$code should be a miss")
        assert(hits.get(code.toString) == 1, s"$code must not be re-fetched")
      }
      // transient class: throws so retrying() owns the backoff
      for (code <- Seq(429, 500, 503)) {
        val e = intercept[java.io.IOException](client.fetch(code.toString))
        assert(e.getMessage.contains(s"HTTP $code"))
        assert(e.getMessage.contains("Retry-After"),
          "the backoff hint must ride the exception message")
      }
    } finally server.stop(0)
  }

  test("http transport surfaces 404 as a permanent miss, not a retry") {
    withFixture { base =>
      val client = new ApiEnrich.HttpMetadataClient(base)
      // craft keys in each class off the real md5 space: scan a few
      val dois = (1 to 400).map(i =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(i.toString))
      def keyOf(d: String) = java.lang.Long.parseLong(d.takeRight(6), 16)
      val miss = dois.find(d => keyOf(d) % 10 == 0 && keyOf(d) % 211 != 0).get
      val hit = dois.find(d => keyOf(d) % 10 != 0 && keyOf(d) % 211 != 0).get
      assert(client.fetch(miss).isEmpty)
      assert(client.fetch(hit).contains("T-" + hit.take(8)))
    }
  }
}
