package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (§2.E): media payloads as opaque `binary`
  * columns with typed metadata, plus a batched decode/feature-extract
  * stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB ([[decodeStub]]); everything around
  * it — binary column construction, schema, partition-preserving batched
  * mapPartitions plumbing, feature array shape — is real and tested
  * (MultimodalSpec). Swapping the stub for a JNI/codec call changes no
  * plan shape.
  */
object Multimodal {

  /** Typed record for the decoded-media stage. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Float])

  /** Metadata extraction over the binary payload column — the verifiable
    * (SQL-expressible) slice of the multimodal pipeline: payload bytes,
    * length, content hash, media type.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"))
      .select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("image/png"))
          .otherwise(lit("audio/wav")).as("media_type"),
        length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("content_md5"))

  val multimodalMetaOracle: String = """
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
      CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
      MD5(text) AS content_md5
    FROM documents"""

  /** STUB decode row: deterministic fake dimensions/features derived
    * from the payload bytes — the oracle-reproducible branch (and the
    * fallback for payloads no bundled codec accepts). Empty payloads (a
    * codec would reject them) decode to zero features instead of
    * crashing the task on modulo-by-zero.
    */
  private def stubRow(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val w = 16 + (bytes.length % 64)
    val h = 16 + ((bytes.length / 64) % 64)
    val feats =
      if (bytes.isEmpty) Array.fill(8)(0f)
      else Array.tabulate(8) { i => bytes(i % bytes.length).toFloat / 127f }
    MediaFeatures(
      doc_id = id,
      media_type = if (id % 2 == 0) "image/png" else "audio/wav",
      n_bytes = bytes.length.toLong,
      width = w, height = h, features = feats)
  }

  /** Magic-byte sniff for the raster formats the JDK-bundled ImageIO
    * readers handle (PNG / JPEG / GIF / BMP) — the cheap pre-filter that
    * keeps the codec off payloads that cannot decode.
    */
  private[graft] def isRaster(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte
        && b(3) == 'G'.toByte) ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) ||
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte))

  /** REAL image decode via `javax.imageio` (public, JDK-bundled — no
    * external codec dependency): returns the actual pixel dimensions and
    * an 8-bin luminance histogram (shares over a ≤64×64 deterministic
    * subsample grid — fixed strides, fixed integer Rec.601 weights, so
    * the feature is reproducible bit-for-bit across JVMs). `None` for
    * payloads that don't sniff as raster or fail to parse — callers fall
    * back to [[stubRow]], so a corrupt byte string degrades instead of
    * failing the task.
    */
  private[graft] def decodeImage(bytes: Array[Byte])
      : Option[(Int, Int, Array[Float])] =
    if (!isRaster(bytes)) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val hist = new Array[Float](8)
        val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587
              + (rgb & 0xff) * 114) / 1000
            hist(math.min(7, lum / 32)) += 1f
            n += 1
            x += sx
          }
          y += sy
        }
        if (n > 0) { var i = 0; while (i < 8) { hist(i) /= n; i += 1 } }
        Some((w, h, hist))
      }
    } catch { case _: Exception => None }

  /** Batched decode / feature extraction over an arbitrary payload
    * dataset — the REAL decode path: `mapPartitions` batching (the Scala
    * analogue of `mapInPandas`; a heavier codec would amortize its init
    * here), magic-byte sniff per row, [[decodeImage]] for raster
    * payloads (real width/height + luminance-histogram features,
    * media_type `image/decoded`), [[stubRow]] fallback for everything
    * else — so the same stage handles a mixed-media corpus without a
    * schema or plan change.
    */
  def decodeFeatures(payloads: Dataset[(Long, Array[Byte])])
      : Dataset[MediaFeatures] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some((w, h, feats)) =>
            MediaFeatures(id, "image/decoded", bytes.length.toLong, w, h, feats)
          case None => stubRow(id, bytes)
        }
      }
    }
  }

  /** The real-codec decode stage over the documents table's payload
    * column. On the synthetic text-backed corpus every row takes the
    * deterministic stub branch — a corpus property the stub-parity spec
    * VERIFIES row-for-row (not a structural guarantee: a text payload
    * whose bytes happen to form a parseable raster header would decode
    * for real, which is the intended production behavior) — making the
    * stage oracle-checkable end-to-end while MultimodalSpec drives the
    * raster branch with real in-memory PNG/JPEG bytes through the same
    * `mapPartitions` plumbing.
    */
  def decodeReal(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeFeatures(
      Tables.documents(spark, dir)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .as[(Long, Array[Byte])])
  }

  /** Batched decode / feature extraction over binary payloads — the
    * stub-only form (every row takes [[stubRow]]); [[decodeReal]] is the
    * same stage with the real raster branch in front.
    */
  def decodeStub(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // Per-partition "codec init" would go here.
        it.map { case (id, bytes) => stubRow(id, bytes) }
      }
  }

  /** Driver-contract wrapper: the feature stage INCLUDING the decoded
    * feature values, flattened to scalar columns f0..f7 (struct/array
    * columns don't hash portably across engines; scalars do). The stub's
    * features are bytes/127 in float32 — the corpus is ASCII, so the
    * oracle reproduces byte i as the codepoint of character i, and
    * k/127f is double-rounding-safe for every byte value (checked
    * exhaustively), making the float32 values bit-identical.
    */
  private def flattenFeatures(ds: Dataset[MediaFeatures]): DataFrame =
    ds.toDF()
      .select(Seq(col("doc_id"), col("media_type"), col("n_bytes"),
        col("width"), col("height")) ++
        (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)

  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    flattenFeatures(decodeStub(spark, dir))

  /** Driver-contract wrapper for the REAL-codec stage ([[decodeReal]]):
    * identical schema; on the text-backed synthetic corpus no payload
    * parses as raster (verified by the stub-parity spec), so every row
    * rides the stub fallback and the stage hash-matches the same oracle
    * — the raster branch itself is exercised by MultimodalSpec on real
    * in-memory PNG/JPEG bytes.
    */
  def multimodalDecodeReal(spark: SparkSession, dir: String): DataFrame =
    flattenFeatures(decodeReal(spark, dir))

  val multimodalDecodeOracle: String = {
    val feats = (0 until 8).map { i =>
      s"CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN CAST(0 AS FLOAT) ELSE " +
        s"CAST(UNICODE(SUBSTR(text, ($i % GREATEST(OCTET_LENGTH(ENCODE(text)), 1)) + 1, 1)) AS FLOAT)" +
        s" / CAST(127 AS FLOAT) END AS f$i"
    }.mkString(",\n      ")
    s"""
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
      CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
      CAST(16 + OCTET_LENGTH(ENCODE(text)) % 64 AS INTEGER) AS width,
      CAST(16 + (OCTET_LENGTH(ENCODE(text)) // 64) % 64 AS INTEGER) AS height,
      $feats
    FROM documents"""
  }

  /** Stub frame geometry: characters per frame and the sampling stride
    * (take every 4th frame — the standard "don't embed every frame"
    * curation step for video). Frames are CHARACTER units because the
    * stub payload is text-backed: byte-based frame counting combined
    * with character-based slicing would misalign on multi-byte text
    * (a real container reads byte frame boundaries from the codec).
    */
  private val FrameChars = 32
  private val FrameStride = 4

  /** Frame sampling over stub payloads: treat each payload as a frame
    * sequence ([[FrameChars]] characters per frame), emit every
    * [[FrameStride]]-th frame with its content hash and a stub feature
    * derived from that hash (hash-derived, so it is engine-portable for
    * ANY unicode text — `ascii`/`UNICODE` disagree on empty and astral
    * inputs). One output row per SAMPLED frame; documents too short for
    * one full frame drop out (a codec would reject them).
    *
    * Scale: explode is linear in sampled frames (1/stride of the
    * payload volume), per-row only — no shuffle at any SF; the frame
    * payload never leaves the scan projection.
    */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        (length(col("text")) / FrameChars).cast("bigint").as("n_frames"))
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(FrameStride.toLong)))
          .as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"), col("n_frames"),
        md5(substr(col("text"), (col("frame_idx") * FrameChars + 1).cast("int"),
          lit(FrameChars)).cast("binary")).as("frame_md5"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"), col("frame_md5"),
        (conv(substring(col("frame_md5"), 1, 2), 16, 10).cast("long").cast("double")
          / lit(255.0)).as("f0"))

  val multimodalFrameSampleOracle: String = s"""
    SELECT doc_id, frame_idx, n_frames, frame_md5,
      CAST(CAST('0x' || SUBSTR(frame_md5, 1, 2) AS BIGINT) AS DOUBLE)
        / CAST(255 AS DOUBLE) AS f0
    FROM (
      SELECT doc_id, frame_idx, n_frames,
        MD5(SUBSTR(text, CAST(frame_idx * $FrameChars + 1 AS INTEGER), $FrameChars))
          AS frame_md5
      FROM (
        SELECT doc_id, text,
          CAST(LENGTH(text) // $FrameChars AS BIGINT) AS n_frames
        FROM documents),
        UNNEST(RANGE(0, n_frames, $FrameStride)) AS t(frame_idx)
      WHERE n_frames >= 1)"""

  /** Target bounding box for the stub resize. */
  private val ResizeBox = 64L

  /** [[decodeStub]]'s dimension formula as Column expressions over the
    * payload byte count — the ONE shared source for every SQL-side view
    * of the stub geometry (MultimodalSpec pins that these agree with
    * decodeStub's JVM ints per document, so the stub and the plans
    * cannot drift apart silently).
    */
  private[graft] def stubWidth(nBytes: Column): Column =
    lit(16L) + pmod(nBytes, lit(64L))
  private[graft] def stubHeight(nBytes: Column): Column =
    lit(16L) + pmod(shiftright(nBytes, 6), lit(64L)) // n div 64 ≡ n >> 6, n ≥ 0

  private def sqlStubWidth(nb: String): String =
    s"CAST(16 + $nb % 64 AS BIGINT)"
  private def sqlStubHeight(nb: String): String =
    s"CAST(16 + ($nb // 64) % 64 AS BIGINT)"

  /** Resize planning over the decoded dimensions: fit each media item
    * into a [[ResizeBox]]² box preserving aspect ratio — output dims are
    * pure integer arithmetic (`dim · box div max(w, h)`, floored at 1),
    * so the plan is engine-exact; only the pixel resampling itself is
    * codec work (stubbed out, like the decode). This is the geometry
    * half every real resize stage computes before touching pixels.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(encode(col("text"), "utf-8")).cast("bigint").as("n_bytes"))
      .select(col("doc_id"),
        stubWidth(col("n_bytes")).as("width"),
        stubHeight(col("n_bytes")).as("height"))
      .select(col("doc_id"), col("width"), col("height"),
        greatest(lit(1L), expr(s"(width * $ResizeBox) div greatest(width, height)"))
          .as("out_width"),
        greatest(lit(1L), expr(s"(height * $ResizeBox) div greatest(width, height)"))
          .as("out_height"))
  }

  lazy val multimodalResizeOracle: String = s"""
    SELECT doc_id, width, height,
      GREATEST(1, (width * $ResizeBox) // GREATEST(width, height)) AS out_width,
      GREATEST(1, (height * $ResizeBox) // GREATEST(width, height)) AS out_height
    FROM (
      SELECT doc_id,
        ${sqlStubWidth("OCTET_LENGTH(ENCODE(text))")} AS width,
        ${sqlStubHeight("OCTET_LENGTH(ENCODE(text))")} AS height
      FROM documents)"""

  def defs: Map[String, QueryDef] = Map(
    "multimodal_meta" -> QueryDef.sql(multimodalMeta, multimodalMetaOracle),
    "multimodal_decode" -> QueryDef.sql(multimodalDecode, multimodalDecodeOracle),
    "multimodal_decode_real" ->
      QueryDef.sql(multimodalDecodeReal, multimodalDecodeOracle),
    "multimodal_frame_sample" -> QueryDef.sql(multimodalFrameSample, multimodalFrameSampleOracle),
    "multimodal_resize" -> QueryDef.sql(multimodalResize, multimodalResizeOracle)
  )
}
