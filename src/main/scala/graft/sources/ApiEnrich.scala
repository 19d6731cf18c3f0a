package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External-API enrichment semantics — the reference's CrossRef consumer
  * (api.py:5-64 consume_crossref): per-DOI HTTP GET with rate limiting and
  * Retry-After backoff. Spark-first, the call pattern becomes ONE client
  * per partition inside `mapPartitions` (connection reuse), a token-bucket
  * rate limit per task, and bounded retry with backoff per record — the
  * shape every distributed API-enrichment stage needs so a 1000-executor
  * job doesn't stampede the remote service.
  *
  * The transport is a deterministic STUB (this container has no network):
  * [[StubMetadataClient]] answers from a pure hash of the DOI and fails
  * transiently on first contact for a deterministic subset of keys, so the
  * retry path is actually exercised. The Spark-side plumbing — partition
  * client lifecycle, limiter, retry, schema — is real and oracle-checked
  * (the stub's responses are md5-derived, so SQL reproduces them).
  */
object ApiEnrich {

  /** Client contract (api.py consume_crossref): fetch metadata for a DOI;
    * None = permanent miss (404); throws = transient failure (429/5xx).
    */
  trait MetadataClient {
    def fetch(doi: String): Option[String]
    def close(): Unit = ()
  }

  /** Deterministic fake transport. Misses ~10% of lookups (by key hash,
    * in parity with the oracle: last-6-hex of the DOI % 10 == 0), and
    * throws once per instance for a sparse key subset (% 211 == 0,
    * ~0.5% — realistic 429 rates; a dense failure set would spend the
    * whole run in backoff sleeps) so the retry path is exercised. A
    * fresh client — i.e. a retried task — succeeds, like a real 429.
    */
  final class StubMetadataClient extends MetadataClient {
    private val failedOnce = new java.util.HashSet[String]()
    override def fetch(doi: String): Option[String] = {
      val key = java.lang.Long.parseLong(doi.takeRight(6), 16)
      if (key % 211 == 0 && !failedOnce.contains(doi)) {
        failedOnce.add(doi)
        throw new java.io.IOException(s"simulated 429 for $doi")
      }
      if (key % 10 == 0) None else Some("T-" + doi.take(8))
    }
  }

  /** Real HTTP transport (api.py:5-64 consume_crossref's GET shape):
    * one JDK HttpURLConnection per fetch against `baseUrl/<doi>`.
    * 200 → Some(body); 429 and 5xx → IOException, i.e. transient —
    * [[retrying]] backs off and re-fetches, which is where a
    * Retry-After pause belongs (the response's hint is carried in the
    * exception message for the caller's backoff policy); every other
    * status (404, 403, 410, …) → permanent miss (None). That mirrors
    * the reference's error handling (api.py:54-61 retries ONLY 429 and
    * records any other HTTP error as a miss) — a persistently-denied
    * key lands as a miss ROW in the enrich output instead of failing
    * the whole task after retry exhaustion. We additionally class 5xx
    * as transient (the Retry-After contract covers them); the
    * reference's requests loop treats them as misses too, so this is
    * strictly more resilient, never less. Selected by conf (see
    * [[clientFactory]]); NEVER the default — this sandbox is
    * zero-egress, so the stub remains the shipped transport and the
    * spec drives this class against an in-process fixture to prove
    * transport parity.
    */
  final class HttpMetadataClient(baseUrl: String,
      connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 10000)
    extends MetadataClient {
    override def fetch(doi: String): Option[String] = {
      val conn = new java.net.URL(s"$baseUrl/$doi").openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("GET")
      try {
        conn.getResponseCode match {
          case 200 =>
            Some(new String(conn.getInputStream.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8))
          case code if code == 429 || code >= 500 =>
            val hint = Option(conn.getHeaderField("Retry-After"))
              .map(s => s"; Retry-After=$s").getOrElse("")
            throw new java.io.IOException(s"HTTP $code for $doi$hint")
          case _ => None
        }
      } finally conn.disconnect()
    }
  }

  /** Conf-selected transport: `spark.graft.api.transport=http` (with
    * `spark.graft.api.baseUrl`) swaps the real client in; the default
    * — and anything unrecognized — is the deterministic stub, so
    * sandbox behavior is unchanged unless explicitly opted in.
    */
  def clientFactory(spark: SparkSession): () => MetadataClient =
    spark.conf.get("spark.graft.api.transport", "stub") match {
      case "http" =>
        val base = spark.conf.get("spark.graft.api.baseUrl")
        () => new HttpMetadataClient(base)
      case _ => () => new StubMetadataClient
    }

  /** Simple token-interval rate limiter: at most `perSecond` acquisitions
    * per second within one task (api.py sleeps on Retry-After; production
    * pacing belongs client-side, before the request). `perSecond <= 0`
    * disables pacing entirely (the unthrottled stub path — Thread.sleep
    * has ~1 ms floor, so sub-ms pacing would dominate wall time).
    */
  final class RateLimiter(perSecond: Int) extends Serializable {
    private val intervalNanos =
      if (perSecond <= 0) 0L else 1000000000L / perSecond
    // nanoTime has an arbitrary (possibly negative) origin — a fixed 0
    // sentinel could make the very first acquire sleep for "years".
    private var nextFree = Long.MinValue
    def acquire(): Unit = {
      if (intervalNanos == 0L) return
      val now = System.nanoTime()
      if (nextFree == Long.MinValue) nextFree = now
      if (now < nextFree) Thread.sleep((nextFree - now) / 1000000L + 1)
      nextFree = math.max(now, nextFree) + intervalNanos
    }
  }

  private def retrying[T](maxAttempts: Int, backoffMs: Long)(op: => T): T = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        // Never swallow an interrupt: a Spark task kill must terminate
        // the task, not trigger a backoff-and-retry cycle.
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        case e: Exception if attempt < maxAttempts =>
          Thread.sleep(backoffMs * attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  case class Enriched(o_orderkey: Long, doi: String, title: String)

  /** Enrich each order's DOI via the (stub) client: one client per
    * partition, rate-limited, retried; misses default to 'Unknown'
    * (databases.py:137). `newClient` is a factory so executors build
    * their own connections — a client is not serializable state.
    */
  def enrichViaApi(
      spark: SparkSession, dir: String,
      newClient: () => MetadataClient = () => new StubMetadataClient,
      perSecond: Int = 0, maxAttempts: Int = 3): DataFrame = {
    import spark.implicits._
    val withDoi = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        md5(col("o_orderkey").cast("string")).as("doi"))
      .as[(Long, String)]
    withDoi.mapPartitions { rows =>
      val client = newClient()
      // Close exactly once when the TASK finishes — covers early
      // termination (limit/take), task failure, and full drain alike;
      // an iterator-exhaustion hook would leak the connection on the
      // first two and double-close on repeated hasNext.
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => client.close()))
      val limiter = new RateLimiter(perSecond)
      rows.map { case (key, doi) =>
        limiter.acquire()
        val meta = retrying(maxAttempts, backoffMs = 1L)(client.fetch(doi))
        Enriched(key, doi, meta.getOrElse("Unknown"))
      }
    }.toDF()
  }

  /** The stub's key derivation in SQL: last 6 hex chars of the md5 DOI,
    * parsed base-16 — so the oracle reproduces hits, misses and titles.
    */
  val enrichViaApiOracle: String = """
    SELECT o_orderkey, doi,
      CASE WHEN CAST('0x' || SUBSTR(doi, 27, 6) AS BIGINT) % 10 = 0
        THEN 'Unknown' ELSE 'T-' || SUBSTR(doi, 1, 8) END AS title
    FROM (SELECT o_orderkey, MD5(CAST(o_orderkey AS VARCHAR)) AS doi FROM orders)"""

  def defs: Map[String, QueryDef] = Map(
    "enrich_api" -> QueryDef.sql(
      (s: SparkSession, d: String) => enrichViaApi(s, d, clientFactory(s)),
      enrichViaApiOracle)
  )
}
