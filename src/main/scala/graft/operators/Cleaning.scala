package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest / clean / validate operators (§2.A) — the reference's stage-2
  * pipeline (`/root/reference/src/utils/utils.py`,
  * `/root/reference/src/utils/databases.py`) re-expressed as pure Column
  * transformations: no UDFs, fully whole-stage-codegen'd, trivially
  * scalable (narrow, per-row, no shuffle except the dictionary join which
  * broadcasts).
  */
object Cleaning {

  /** Drop rows where ALL key identifier fields are null — reference
    * `load_dataset` dropna(subset=['arxiv','doi'], how='all') (utils.py:33).
    * The testdata has no nulls, so we derive nullable identifiers first
    * (deterministically) and then apply the validation filter.
    */
  def cleanDropna(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nullif(col("source"), lit("src0")).as("doi"),
        nullif(col("lang"), lit("en")).as("arxiv"))
      .filter(col("doi").isNotNull || col("arxiv").isNotNull)

  val cleanDropnaOracle: String = """
    SELECT doc_id, NULLIF(source, 'src0') AS doi, NULLIF(lang, 'en') AS arxiv
    FROM documents
    WHERE NULLIF(source, 'src0') IS NOT NULL OR NULLIF(lang, 'en') IS NOT NULL"""

  /** Whitespace collapse + trim — reference `clean_text` (databases.py:66). */
  def cleanTextNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("text_clean"))

  val cleanTextNormalizeOracle: String = """
    SELECT doc_id, TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')) AS text_clean
    FROM documents"""

  /** Null → 'Unknown' defaulting — reference databases.py:137 (license /
    * journal_ref / doi default handling). Nullable column derived first.
    */
  def cleanNullDefault(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        coalesce(nullif(col("lang"), lit("de")), lit("Unknown")).as("lang_filled"),
        coalesce(nullif(col("source"), lit("src1")), lit("Unknown")).as("source_filled"))

  val cleanNullDefaultOracle: String = """
    SELECT doc_id,
      COALESCE(NULLIF(lang, 'de'), 'Unknown') AS lang_filled,
      COALESCE(NULLIF(source, 'src1'), 'Unknown') AS source_filled
    FROM documents"""

  /** Date → ISO-8601 normalization — reference `convert_to_iso_format`
    * (databases.py:57). Output as string: engine-portable, and exactly the
    * reference's target representation.
    */
  def cleanDateNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("order_date_iso"))

  val cleanDateNormalizeOracle: String = """
    SELECT o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS order_date_iso
    FROM orders"""

  /** Per-row token dedup + sort — reference `get_unique_categories`
    * (utils.py:46): ' '.join(sorted(set(row.split()))).
    */
  def dedupTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
          .as("unique_tokens"))

  val dedupTokensOracle: String = """
    SELECT doc_id,
      ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ' ') AS unique_tokens
    FROM documents"""

  /** Dictionary mapping with identity fallback via broadcast join —
    * reference `map_category` (utils.py:53): mapping.get(cat, cat),
    * loaded from a packaged JSON resource exactly as the reference loads
    * src/resources/category_mapping.json (utils.py:49
    * load_category_mapping). At 100 TB the mapping is a few KB —
    * broadcast, no shuffle; parsed once on the driver.
    */
  private lazy val langFamily: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/category_mapping.json")
    require(in != null, "category_mapping.json missing from classpath resources")
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    import scala.jdk.CollectionConverters._
    node.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
  }

  def mapCategory(spark: SparkSession, dir: String): DataFrame = {
    val mapping = spark.createDataFrame(langFamily).toDF("code", "family")
    Tables.documents(spark, dir)
      .join(broadcast(mapping), col("lang") === col("code"), "left")
      .select(
        col("doc_id"),
        col("lang"),
        coalesce(col("family"), col("lang")).as("general_category"))
  }

  val mapCategoryOracle: String = """
    SELECT doc_id, lang, COALESCE(m.family, lang) AS general_category
    FROM documents
    LEFT JOIN (VALUES ('en','germanic'), ('de','germanic'), ('es','romance'),
                      ('fr','romance'), ('it','romance'), ('pt','romance'),
                      ('zh','sino-tibetan'), ('ja','japonic'), ('ru','slavic'))
           AS m(code, family) ON lang = m.code"""

  /** Delimited string → exploded rows — reference `handle_authors`
    * (utils.py:74): split, trim, drop empties, one row per author.
    */
  def explodeAuthors(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("token"))
      .select(col("p_partkey"), trim(col("token")).as("author_name"))
      .filter(col("author_name") =!= "")

  val explodeAuthorsOracle: String = """
    SELECT p_partkey, author_name FROM (
      SELECT p_partkey, TRIM(UNNEST(STRING_SPLIT(p_name, ' '))) AS author_name
      FROM part
    ) WHERE author_name <> ''"""

  /** Typed author parsing — reference `handle_authors` /
    * `transform_author_field` (utils.py:74-88): a comma-delimited author
    * string becomes `array<struct<name:string>>` (trim each token, drop
    * empties), i.e. the reference's actual stage-2 data shape, then a
    * typed posexplode to one (publication, position, author) row. The
    * struct construction is pure Column code (`transform` + `struct`);
    * AuthorStructSpec pins the intermediate schema. The driver-checked
    * output is the flattened projection (structs don't hash portably
    * across engines).
    */
  def authorsStructTyped(spark: SparkSession, dir: String): DataFrame = {
    // The lake has no comma-delimited column; derive the reference's
    // input shape ("Name A,Name B") from the part name, then apply the
    // reference's parse exactly: split ',' → trim → drop '' → struct.
    val authorString = regexp_replace(col("p_name"), " ", ",")
    val authors = filter(
      transform(split(authorString, ","), s => struct(trim(s).as("name"))),
      a => a("name") =!= "")
    Tables.part(spark, dir)
      .select(col("p_partkey"), authors.as("authors"))
  }

  def explodeAuthorsStruct(spark: SparkSession, dir: String): DataFrame =
    authorsStructTyped(spark, dir)
      .select(col("p_partkey"),
        posexplode(col("authors")).as(Seq("author_pos", "author")))
      .select(col("p_partkey"),
        col("author_pos").cast("bigint").as("author_pos"),
        col("author.name").as("author_name"))

  val explodeAuthorsStructOracle: String = """
    WITH base AS (
      SELECT p_partkey,
        LIST_FILTER(
          LIST_TRANSFORM(STRING_SPLIT(REPLACE(p_name, ' ', ','), ','),
            s -> {'name': TRIM(s)}),
          a -> a.name <> '') AS authors
      FROM part)
    SELECT p_partkey,
      UNNEST(RANGE(LEN(authors))) AS author_pos,
      UNNEST(LIST_TRANSFORM(authors, a -> a.name)) AS author_name
    FROM base"""

  /** Deterministic surrogate keys — reference `handle_id` (utils.py:66)
    * mints uuid4 per row; uuid4 is non-reproducible and breaks retries /
    * exactly-once at scale, so we derive the surrogate from the natural
    * key with md5 (stable, idempotent, shardable).
    */
  def surrogateId(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        md5(concat_ws("|",
          col("o_orderkey").cast("string"), col("o_custkey").cast("string")))
          .as("surrogate_id"))

  val surrogateIdOracle: String = """
    SELECT o_orderkey,
      MD5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)) AS surrogate_id
    FROM orders"""

  /** HTML markup extraction — the web-corpus cleanup stage upstream of
    * every text operator (the reference's stage-2 text cleaning,
    * databases.py:66, generalized to markup input): strip tags, decode
    * the six common character entities, collapse whitespace. The entity
    * chain decodes `&amp;` LAST so `&amp;lt;` yields the literal `&lt;`
    * (no double-decode). Pure per-row codegen'd Column expressions, no
    * shuffle — runs at parquet scan speed at any corpus size. The entity
    * table is interpolated into the oracle from the same Seq so the two
    * engines can never disagree on the chain.
    */
  private val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def htmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val noTags = regexp_replace(col("text"), "<[^>]*>", " ")
    val decoded = htmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      org.apache.spark.sql.functions.replace(c, lit(e), lit(r))
    }
    val plain = trim(regexp_replace(decoded, "\\s+", " "))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit("<[^>]*>")).cast("bigint").as("n_tags"),
        plain.as("text_plain"),
        length(plain).cast("bigint").as("n_chars_plain"))
  }

  val htmlStripOracle: String = {
    def sqlQuote(s: String) = s.replace("'", "''")
    val decoded = htmlEntities.foldLeft(
      "REGEXP_REPLACE(text, '<[^>]*>', ' ', 'g')") { case (e0, (e, r)) =>
      s"REPLACE($e0, '${sqlQuote(e)}', '${sqlQuote(r)}')"
    }
    val plain = s"TRIM(REGEXP_REPLACE($decoded, '\\s+', ' ', 'g'))"
    s"""
    SELECT doc_id,
      CAST(LEN(REGEXP_EXTRACT_ALL(text, '<[^>]*>')) AS BIGINT) AS n_tags,
      $plain AS text_plain,
      CAST(LENGTH($plain) AS BIGINT) AS n_chars_plain
    FROM documents"""
  }

  def defs: Map[String, QueryDef] = Map(
    "clean_dropna" -> QueryDef.sql(cleanDropna, cleanDropnaOracle),
    "clean_text_normalize" -> QueryDef.sql(cleanTextNormalize, cleanTextNormalizeOracle),
    "clean_null_default" -> QueryDef.sql(cleanNullDefault, cleanNullDefaultOracle),
    "clean_date_normalize" -> QueryDef.sql(cleanDateNormalize, cleanDateNormalizeOracle),
    "dedup_tokens" -> QueryDef.sql(dedupTokens, dedupTokensOracle),
    "map_category" -> QueryDef.sql(mapCategory, mapCategoryOracle),
    "explode_authors" -> QueryDef.sql(explodeAuthors, explodeAuthorsOracle),
    "explode_authors_struct" -> QueryDef.sql(explodeAuthorsStruct, explodeAuthorsStructOracle),
    "surrogate_id" -> QueryDef.sql(surrogateId, surrogateIdOracle),
    "html_strip" -> QueryDef.sql(htmlStrip, htmlStripOracle)
  )
}
