package graft.sources

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion paths beyond parquet (§2.A) — the reference's source format
  * is JSON-lines read row-by-row (utils.py load_dataset: json.loads per
  * line, skip/route bad rows). Spark-first that becomes `spark.read.json`
  * with an EXPLICIT schema (no inference pass over 100 TB) and PERMISSIVE
  * corrupt-record routing: malformed lines land in `_corrupt_record`
  * instead of failing the job, mirroring the reference's tolerant loader.
  */
object Ingest {

  /** Explicit documents schema. At scale an inferred schema costs a full
    * extra pass and can drift between batches — production JSONL ingest
    * always pins the schema.
    */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The same schema plus the corrupt-record routing column (for the
    * PERMISSIVE inspection path).
    */
  val documentsJsonSchema: StructType =
    documentsSchema.add(StructField("_corrupt_record", StringType))

  /** Inspection read: PERMISSIVE with malformed lines routed to
    * `_corrupt_record`. NOTE Spark disallows querying only the corrupt
    * column from a raw file scan — callers must cache the parsed frame
    * before filtering on it (see IngestSpec), which is why the bulk
    * ingest path below uses DROPMALFORMED instead.
    */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsJsonSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Staging dir for round-trip ingests: unique per PROCESS and per
    * CALL (pid + nonce), so concurrent runs — across JVMs or within one
    * — never overwrite each other's staging mid-read
    * (SaveMode.Overwrite deletes the target first), and two data dirs
    * whose sanitized names collide cannot alias.
    */
  private val stagingNonce = new java.util.concurrent.atomic.AtomicLong(0L)

  private def stagingDir(kind: String, dir: String): String =
    new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_${kind}_${java.lang.ProcessHandle.current().pid()}_" +
        s"${stagingNonce.incrementAndGet()}_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath

  /** Round-trip ingest: stage the documents table as JSONL through the
    * sink, read it back through the schema'd JSONL source, keep only
    * clean rows (DROPMALFORMED — single streamed pass, no cache; the
    * routing variant above is for corpus triage). Hash-checked against
    * the parquet path — proving the JSONL write→read cycle is lossless
    * for every column. NOTE the staging write runs eagerly when the
    * DataFrame is built — ingest is I/O by nature.
    */
  def ingestJsonl(spark: SparkSession, dir: String): DataFrame = {
    val stage = stagingDir("jsonl", dir)
    Sinks.writeJsonLines(Tables.documents(spark, dir), stage)
    spark.read
      .schema(documentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(stage)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
  }

  val ingestJsonlOracle: String = """
    SELECT doc_id, text, lang, source, n_chars FROM documents"""

  /** CSV round-trip ingest: the interchange-format twin of
    * [[ingestJsonl]] — headered CSV staged through the sink, read back
    * with the pinned schema (no inference pass) and DROPMALFORMED.
    * multiLine=true is REQUIRED for losslessness: the writer quotes
    * embedded newlines, but the default line-splitting reader would
    * shear a quoted multi-line field into malformed fragments that
    * DROPMALFORMED silently discards. The cost is per-file (not
    * per-split) parallelism — which is why JSONL, whose records are
    * newline-free by construction, is the preferred bulk format and CSV
    * is the interchange path.
    */
  def ingestCsv(spark: SparkSession, dir: String): DataFrame = {
    val stage = stagingDir("csv", dir)
    Sinks.writeCsv(Tables.documents(spark, dir), stage)
    spark.read
      .schema(documentsSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("mode", "DROPMALFORMED")
      .csv(stage)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
  }

  val ingestCsvOracle: String = """
    SELECT doc_id, text, lang, source, n_chars FROM documents"""

  def defs: Map[String, QueryDef] = Map(
    "ingest_jsonl" -> QueryDef.sql(ingestJsonl, ingestJsonlOracle),
    "ingest_csv" -> QueryDef.sql(ingestCsv, ingestCsvOracle)
  )
}
