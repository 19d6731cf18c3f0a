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
}
