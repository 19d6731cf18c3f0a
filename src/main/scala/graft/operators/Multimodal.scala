package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (§2.E): media payloads as opaque `binary`
  * columns with typed metadata, plus a batched decode/feature-extract
  * stage.
  *
  * Raster formats the JDK bundles readers for (PNG/JPEG/GIF/BMP) decode
  * and resample FOR REAL via `javax.imageio` ([[decodeImage]],
  * [[resampleImage]]); everything else (audio/video — the container has
  * no such codecs) rides a clearly-marked deterministic STUB
  * ([[stubRow]]) so a mixed corpus degrades instead of failing. The
  * plumbing — binary column construction, schema, partition-preserving
  * batched mapPartitions, feature array shape — is identical on both
  * branches and tested (MultimodalSpec); swapping in a heavier codec
  * changes no plan shape.
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
    * parses as raster, so every row rides the stub fallback and the
    * stage hash-matches the same oracle — the raster branch itself is
    * exercised by MultimodalSpec on real in-memory PNG/JPEG bytes.
    * Stub parity is a DATA property, not a structural one, so this
    * oracle-checked wrapper asserts it in the plan: a corpus payload
    * that unexpectedly decodes as a real raster fails LOUD with this
    * message instead of surfacing as an inscrutable hash mismatch.
    * Production callers wanting the raster branch use [[decodeReal]] /
    * [[decodeFeatures]] directly.
    */
  def multimodalDecodeReal(spark: SparkSession, dir: String): DataFrame =
    stubParityGuard(flattenFeatures(decodeReal(spark, dir)),
      "image/decoded", "multimodal_decode_real")

  /** The loud stub-parity assertion shared by the oracle-checked REAL
    * wrappers: any row whose media_type proves the raster branch ran
    * fails the job with a clear message (assert_true in the plan, the
    * ngram_jaccard idiom) instead of surfacing as a hash mismatch
    * against the stub oracle.
    */
  private[graft] def stubParityGuard(df: DataFrame, banned: String,
      op: String): DataFrame =
    df.filter(assert_true(col("media_type") =!= lit(banned),
      concat(lit(s"$op: doc_id "), col("doc_id"),
        lit(s" took the real raster branch (media_type $banned) — the " +
          "stub-parity oracle no longer applies to this corpus; check " +
          "the payload or re-register against a raster-aware oracle"))).isNull)

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

  /** One sampled frame — shared row shape of the real-codec and stub
    * frame branches ([[frameSamples]]).
    */
  final case class SampledFrame(doc_id: Long, media_type: String,
      frame_idx: Long, n_frames: Long, frame_md5: String, f0: Double)

  /** GIF magic — the one multi-frame container the JDK-bundled ImageIO
    * reads without extra codecs.
    */
  private[graft] def isGif(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** The stub/oracle f0 formula (first md5 byte as a 0..1 share),
    * computed JVM-side — identical to the plan's
    * `conv(substr(md5,1,2),16,10) / 255.0`.
    */
  private def md5F0(md5: String): Double =
    java.lang.Long.parseLong(md5.substring(0, 2), 16).toDouble / 255.0

  /** REAL multi-frame extraction via `javax.imageio`: every
    * [[FrameStride]]-th stored GIF frame, fingerprinted by the md5 of
    * its ARGB pixel words — frame content AS THE CODEC STORES IT (no
    * disposal compositing: fingerprint semantics, not playback).
    * `None` for payloads that don't sniff/parse as GIF — callers fall
    * back to the char-frame stub, same mixed-media contract as
    * [[decodeImage]]/[[resampleImage]].
    */
  private[graft] def gifFrameSamples(bytes: Array[Byte])
      : Option[Seq[(Long, Long, String)]] =
    if (!isGif(bytes)) None
    else try {
      // the stream must CLOSE on every path: with ImageIO's default
      // disk cache it is backed by an open temp file, and a per-row
      // leak exhausts task fds long before the corpus ends
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n < 1) None
            else Some((0 until n by FrameStride).map { i =>
              val img = r.read(i)
              val w = img.getWidth; val h = img.getHeight
              val buf = java.nio.ByteBuffer.allocate(w * h * 4)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { buf.putInt(img.getRGB(x, y)); x += 1 }
                y += 1
              }
              (i.toLong, n.toLong, md5Hex(buf.array))
            })
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** The char-frame stub as a JVM-side row iterator — bit-identical to
    * [[multimodalFrameSample]]'s plan (and its oracle): frames are CODE
    * POINTS, not UTF-16 units, because Spark's `substr`/`length` and
    * DuckDB both count code points — a Java `String.substring` slice
    * would misalign on astral characters.
    */
  private[graft] def stubFrameSamples(id: Long,
      bytes: Array[Byte]): Iterator[SampledFrame] = {
    val cps = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .codePoints().toArray
    val n = cps.length / FrameChars
    if (n < 1) Iterator.empty
    else (0 until n by FrameStride).iterator.map { i =>
      val md5 = md5Hex(new String(cps, i * FrameChars, FrameChars)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      SampledFrame(id, "text/frames", i.toLong, n.toLong, md5, md5F0(md5))
    }
  }

  /** Batched frame sampling over binary payloads — the REAL codec path:
    * `mapPartitions` batching, [[gifFrameSamples]] for GIF payloads
    * (true stored frames, media_type `video/gif-frames`), the
    * char-frame stub for everything else — same mixed-media contract
    * as [[decodeFeatures]]/[[resizeFeatures]]. Scale: flatMap is linear
    * in sampled frames, per-row only — no shuffle at any SF.
    */
  def frameSamples(payloads: Dataset[(Long, Array[Byte])])
      : Dataset[SampledFrame] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        gifFrameSamples(bytes) match {
          case Some(frames) => frames.iterator.map { case (i, n, md5) =>
            SampledFrame(id, "video/gif-frames", i, n, md5, md5F0(md5))
          }
          case None => stubFrameSamples(id, bytes)
        }
      }
    }
  }

  /** Driver-contract wrapper for the REAL frame-sampling stage: same
    * column set (and oracle) as [[multimodalFrameSample]]. On the
    * text-backed corpus no payload sniffs as GIF, so every row rides
    * the char-frame stub — asserted in the plan via the shared
    * stub-parity guard, exactly like [[multimodalDecodeReal]] /
    * [[multimodalResizeReal]]; MultimodalSpec drives the GIF branch
    * with an in-memory animated GIF through the same mapPartitions
    * plumbing.
    */
  def multimodalFrameSampleReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    stubParityGuard(
        frameSamples(
          Tables.documents(spark, dir)
            .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
            .as[(Long, Array[Byte])])
          .toDF(),
        "video/gif-frames", "multimodal_frame_sample_real")
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("frame_md5"), col("f0"))
  }

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

  /** Typed record for the resampled-media stage. */
  final case class ResizedMedia(
      doc_id: Long, media_type: String, width: Int, height: Int,
      out_width: Int, out_height: Int, features: Array[Float])

  /** The fit-box output geometry as pure integer arithmetic — the one
    * shared formula for the JVM resampler, the SQL geometry plan, and
    * the oracle (`dim · box div max(w, h)`, floored at 1; images smaller
    * than the box upscale, matching [[multimodalResize]]'s plan).
    */
  private[graft] def fitBox(w: Int, h: Int, box: Long): (Int, Int) = {
    val m = math.max(w, h).toLong
    (math.max(1L, w.toLong * box / m).toInt,
      math.max(1L, h.toLong * box / m).toInt)
  }

  /** REAL pixel resample via the same `javax.imageio` raster branch as
    * [[decodeImage]]: decode, fit-box the geometry, then AREA-AVERAGE
    * each output pixel over its source block in pure integer arithmetic
    * (block bounds `x·w div ow`, channel means by integer division,
    * Rec.601 integer luminance) — deterministic bit-for-bit across
    * JVMs, no float resampling kernel. Returns the source dims, output
    * dims, and the 8-bin luminance histogram OF THE RESAMPLED raster
    * (shares over out_width·out_height pixels — the feature that proves
    * pixels were actually touched, and what a downstream embedding
    * stage would consume). On upscale a source block clamps to ≥1 pixel
    * (nearest-neighbor degenerate case). `None` for payloads that don't
    * sniff/parse as raster — callers fall back to the stub geometry.
    */
  private[graft] def resampleImage(bytes: Array[Byte], box: Long)
      : Option[(Int, Int, Int, Int, Array[Float])] =
    if (!isRaster(bytes)) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val (ow, oh) = fitBox(w, h, box)
        val hist = new Array[Float](8)
        var y = 0
        while (y < oh) {
          val sy0 = (y.toLong * h / oh).toInt
          val sy1 = math.max(sy0 + 1, ((y + 1).toLong * h / oh).toInt)
          var x = 0
          while (x < ow) {
            val sx0 = (x.toLong * w / ow).toInt
            val sx1 = math.max(sx0 + 1, ((x + 1).toLong * w / ow).toInt)
            var rs = 0L; var gs = 0L; var bs = 0L; var n = 0L
            var sy = sy0
            while (sy < sy1) {
              var sx = sx0
              while (sx < sx1) {
                val rgb = img.getRGB(sx, sy)
                rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff
                bs += rgb & 0xff; n += 1
                sx += 1
              }
              sy += 1
            }
            val lum = ((rs / n) * 299 + (gs / n) * 587 + (bs / n) * 114) / 1000
            hist(math.min(7, (lum / 32).toInt)) += 1f
            x += 1
          }
          y += 1
        }
        val total = ow.toLong * oh
        var i = 0
        while (i < 8) { hist(i) /= total; i += 1 }
        Some((w, h, ow, oh, hist))
      }
    } catch { case _: Exception => None }

  /** Batched resize over binary payloads — the REAL pixel path:
    * `mapPartitions` batching, [[resampleImage]] for raster payloads
    * (true dims, fit-box output dims, resampled-luminance features,
    * media_type `image/resized`), stub geometry + stub features for
    * everything else — same mixed-media contract as [[decodeFeatures]].
    */
  def resizeFeatures(payloads: Dataset[(Long, Array[Byte])])
      : Dataset[ResizedMedia] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        resampleImage(bytes, ResizeBox) match {
          case Some((w, h, ow, oh, feats)) =>
            ResizedMedia(id, "image/resized", w, h, ow, oh, feats)
          case None =>
            val s = stubRow(id, bytes)
            val (ow, oh) = fitBox(s.width, s.height, ResizeBox)
            ResizedMedia(id, s.media_type, s.width, s.height, ow, oh,
              s.features)
        }
      }
    }
  }

  /** Driver-contract wrapper for the REAL resample stage: geometry AND
    * the per-item feature columns (f0..f7 — resampled-luminance shares
    * on the raster branch, stub byte features on the fallback). On the
    * text-backed corpus every row rides the stub fallback, making the
    * stage oracle-checkable — and, as with [[multimodalDecodeReal]],
    * that DATA property is asserted in the plan so a payload that
    * unexpectedly resamples for real fails loud, not as a hash
    * mismatch. MultimodalSpec drives the raster branch with in-memory
    * images and pins the resampled histogram against an independent
    * reference computation.
    */
  def multimodalResizeReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    stubParityGuard(
        resizeFeatures(
          Tables.documents(spark, dir)
            .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
            .as[(Long, Array[Byte])])
          .toDF(),
        "image/resized", "multimodal_resize_real")
      .select(Seq(col("doc_id"), col("media_type"), col("width"),
        col("height"), col("out_width"), col("out_height")) ++
        (0 until 8).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
  }

  lazy val multimodalResizeRealOracle: String = {
    val feats = (0 until 8).map { i =>
      s"CASE WHEN OCTET_LENGTH(ENCODE(text)) = 0 THEN CAST(0 AS FLOAT) ELSE " +
        s"CAST(UNICODE(SUBSTR(text, ($i % GREATEST(OCTET_LENGTH(ENCODE(text)), 1)) + 1, 1)) AS FLOAT)" +
        s" / CAST(127 AS FLOAT) END AS f$i"
    }.mkString(",\n      ")
    s"""
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
      CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
      CAST(GREATEST(1, (width * $ResizeBox) // GREATEST(width, height))
        AS INTEGER) AS out_width,
      CAST(GREATEST(1, (height * $ResizeBox) // GREATEST(width, height))
        AS INTEGER) AS out_height,
      $feats
    FROM (
      SELECT doc_id, text,
        ${sqlStubWidth("OCTET_LENGTH(ENCODE(text))")} AS width,
        ${sqlStubHeight("OCTET_LENGTH(ENCODE(text))")} AS height
      FROM documents)"""
  }

  // ---- audio metadata / energy (javax.sound.sampled real branch) ----

  /** WAV magic sniff (RIFF....WAVE) — the audio twin of [[isRaster]]:
    * keeps the decoder off payloads that cannot be WAV containers.
    */
  private[graft] def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
      b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
      b(10) == 'V'.toByte && b(11) == 'E'.toByte

  /** REAL audio decode via `javax.sound.sampled` (JDK-bundled, public —
    * the audio analog of the imageio raster branch): container sample
    * rate, frame count, integer duration, and the signal's integer RMS
    * over 16-bit signed little-endian PCM samples (Σs² is an exact
    * BIGINT fold; the one IEEE sqrt floors to a long — reproducible
    * bit-for-bit across JVMs). None for payloads that don't sniff/parse
    * as WAV — callers fall back to the stub.
    */
  private[graft] def decodeWav(bytes: Array[Byte])
      : Option[(Long, Long, Long, Long)] =
    if (!isWav(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val rate = fmt.getSampleRate.toLong
        val frames = in.getFrameLength
        if (rate <= 0 || frames < 0) None
        else {
          val durationMs = frames * 1000L / rate
          // 16-bit signed little-endian PCM RMS (the format the spec
          // writes; other encodings report rms = 0 rather than guess)
          val rms =
            if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian) {
              val data = in.readAllBytes()
              var i = 0; var n = 0L; var ss = 0L
              while (i + 1 < data.length) {
                val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toLong
                ss += s * s; n += 1; i += 2
              }
              if (n == 0) 0L else math.floor(math.sqrt(ss.toDouble / n)).toLong
            } else 0L
          Some((rate, frames, durationMs, rms))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Audio metadata/energy, stub form (oracle-checked): deterministic
    * container facts from the payload bytes — the audio row every
    * media manifest carries (rate, frames, duration, signal energy),
    * with the stub standing in for the codec exactly like
    * [[multimodalDecode]]'s image stub. Per-row, shuffle-free.
    */
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
        col("text"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("image/png"))
          .otherwise(lit("audio/wav")).as("media_type"),
        (lit(8000L) + (length(col("payload")).cast("bigint") % 8) * 1000L)
          .as("sample_rate"),
        length(col("payload")).cast("bigint").as("n_frames"))
      .withColumn("duration_ms",
        expr("(n_frames * 1000) div sample_rate"))
      .withColumn("rms", lit(0L))

  val multimodalAudioOracle: String = """
    SELECT doc_id,
      CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
        AS media_type,
      8000 + (CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) % 8) * 1000
        AS sample_rate,
      CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_frames,
      (CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) * 1000)
        // (8000 + (CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) % 8) * 1000)
        AS duration_ms,
      CAST(0 AS BIGINT) AS rms
    FROM documents"""

  /** [[multimodalAudio]] with the REAL `javax.sound.sampled` branch
    * attempted first ([[decodeWav]]) and the stub fallback for
    * everything else — this corpus's payloads are text, so every row
    * falls back and the stub oracle applies ([[stubParityGuard]] fails
    * loud in-plan otherwise); the WAV branch is spec-pinned against
    * constructed in-memory PCM with hand-computed rate/frames/RMS.
    */
  def multimodalAudioReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        decodeWav(bytes) match {
          case Some((rate, frames, durMs, rms)) =>
            (id, "audio/decoded", rate, frames, durMs, rms)
          case None =>
            val n = bytes.length.toLong
            val rate = 8000L + (n % 8) * 1000L
            (id, if (id % 2 == 0) "image/png" else "audio/wav",
              rate, n, n * 1000L / rate, 0L)
        }
      }).toDF("doc_id", "media_type", "sample_rate", "n_frames",
        "duration_ms", "rms")
    stubParityGuard(rows, "audio/decoded", "multimodal_audio_real")
  }

  // ---- perceptual-hash near-dup (image dedup via dHash) ----

  /** dHash grid geometry: 5×13 luminance samples → 5 rows × 12
    * horizontal gradients = 60 fingerprint bits (positive BIGINT), cut
    * into 4 bands × 15 bits for the LSH-style candidate join. Hamming
    * ≤ 10 (of 60) is the near-dup verdict — dHash's standard "same
    * image, re-encoded/resized/brightness-shifted" regime (gradient
    * signs survive monotone tone changes; see the invariance spec).
    */
  private val PhashRows = 5
  private val PhashCols = 13
  private val PhashBands = 4
  private val PhashBandBits = 15
  private val PhashHammingMax = 10L

  /** Scalar stub fingerprint over the TEXT characters (this corpus is
    * pure ASCII, so chars ≡ UTF-8 bytes): 65 stride-sampled codepoints
    * play the luminance grid. MUST mirror [[phashExprSql]] exactly —
    * the parity is spec-pinned.
    */
  private[graft] def phashStub(text: String): Long = {
    val samples = PhashRows * PhashCols
    val n = text.length
    if (n == 0) 0L
    else {
      val stride = math.max(1, n / samples)
      def v(i: Int): Int = text.charAt((i * stride) % n).toInt
      var fp = 0L
      var r = 0
      while (r < PhashRows) {
        var c = 0
        while (c < PhashCols - 1) {
          if (v(r * PhashCols + c) > v(r * PhashCols + c + 1))
            fp |= 1L << (r * (PhashCols - 1) + c)
          c += 1
        }
        r += 1
      }
      fp
    }
  }

  /** The stub fingerprint as generated SQL over (text, n_chars) — one
    * template serves Spark (`divOp = "div"`) and DuckDB (`"//"`), so
    * query and oracle cannot desync.
    */
  private[graft] def phashExprSql(divOp: String): String = {
    val samples = PhashRows * PhashCols
    val stride = s"GREATEST(1, n_chars $divOp $samples)"
    def v(i: Int) =
      s"ASCII(SUBSTRING(text, (($i * $stride) % n_chars) + 1, 1))"
    (for (r <- 0 until PhashRows; c <- 0 until PhashCols - 1) yield
      s"(CASE WHEN ${v(r * PhashCols + c)} > ${v(r * PhashCols + c + 1)} " +
        s"THEN CAST(${1L << (r * (PhashCols - 1) + c)} AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END)")
      .mkString("\n        + ")
  }

  /** REAL dHash via the same `javax.imageio` branch as [[decodeImage]]:
    * integer area-average luminance into the 5×13 grid (block bounds
    * `c·w div cols`, Rec.601 integer weights — bit-reproducible across
    * JVMs), gradient bits from horizontal comparisons. None for
    * non-raster payloads — callers fall back to [[phashStub]].
    */
  private[graft] def phashImage(bytes: Array[Byte]): Option[Long] =
    if (!isRaster(bytes)) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val cell = Array.ofDim[Long](PhashRows, PhashCols)
        var r = 0
        while (r < PhashRows) {
          var c = 0
          while (c < PhashCols) {
            val x0 = c * w / PhashCols
            val x1 = math.max(x0 + 1, (c + 1) * w / PhashCols)
            val y0 = r * h / PhashRows
            val y1 = math.max(y0 + 1, (r + 1) * h / PhashRows)
            var s = 0L; var n = 0L
            var y = y0
            while (y < y1 && y < h) {
              var x = x0
              while (x < x1 && x < w) {
                val rgb = img.getRGB(x, y)
                s += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587
                  + (rgb & 0xff) * 114) / 1000
                n += 1; x += 1
              }
              y += 1
            }
            cell(r)(c) = if (n > 0) s / n else 0L
            c += 1
          }
          r += 1
        }
        var fp = 0L
        r = 0
        while (r < PhashRows) {
          var c = 0
          while (c < PhashCols - 1) {
            if (cell(r)(c) > cell(r)(c + 1))
              fp |= 1L << (r * (PhashCols - 1) + c)
            c += 1
          }
          r += 1
        }
        Some(fp)
      }
    } catch { case _: Exception => None }

  /** Banded Hamming near-dup pairs over a (doc_id, phash) frame — the
    * dedup_minhash_lsh discipline on fingerprint bits: candidates share
    * at least one 15-bit band (the band key lives IN the join key —
    * never an all-pairs product), verified with exact `bit_count(xor)`
    * ≤ [[PhashHammingMax]]. Pigeonhole: 4 bands × 15 bits means any
    * pair within Hamming 3 ALWAYS shares a clean band; beyond that
    * recall follows the banding curve — the same bands × bits knob a
    * 100 TB image-dedup pass tunes.
    */
  private def phashPairs(fps: DataFrame): DataFrame =
    phashBandedPairs(fps, cut = Some(PhashHammingMax))

  /** The shared banded candidate join: band key IN the join key, exact
    * bit_count verify, and — when `cut` is set — the Hamming ceiling
    * applied BEFORE the distinct so dedup only pays for survivors.
    */
  private def phashBandedPairs(fps: DataFrame, cut: Option[Long]): DataFrame = {
    val bandStructs = (0 until PhashBands).map { b =>
      struct(lit(b).as("band"), lit(1L << (b * PhashBandBits)).as("dv"))
    }
    val banded = fps
      .select(col("doc_id"), col("phash"),
        explode(array(bandStructs: _*)).as("bd"))
      .select(col("doc_id"), col("phash"),
        col("bd.band").as("band"), col("bd.dv").as("dv"))
      .withColumn("chunk", expr(s"(phash div dv) % ${1 << PhashBandBits}"))
      .drop("dv")
    val a = banded.select(col("doc_id").as("doc_a"), col("phash").as("fa"),
      col("band"), col("chunk"))
    val b = banded.select(col("doc_id").as("doc_b"), col("phash").as("fb"),
      col("band"), col("chunk"))
    val verified = a.join(b, Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(fa ^ fb) as bigint)").as("hamming"))
    cut.fold(verified)(h => verified.filter(col("hamming") <= h))
      .distinct()
  }

  /** Perceptual-hash image near-dup pairs, stub form (oracle-checked):
    * the dHash fingerprint over the deterministic stub grid, banded
    * candidates, exact Hamming verify — image dedup's answer to
    * dedup_simhash (simhash near-dups TOKENS; this near-dups the
    * RASTER, robust to re-encode/resize/brightness, the multimodal
    * twin every image-bearing corpus runs before training).
    *
    * Scale: fingerprints are scan-speed (one pass, no shuffle); the
    * candidate join shuffles only (doc_id, phash, band, chunk) tuples
    * with the band key in the join key; verification is one integer
    * xor/popcount per candidate.
    */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame =
    phashPairs(Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), expr(phashExprSql("div")).as("phash")))

  lazy val multimodalPhashOracle: String = {
    val divisors = (0 until PhashBands)
      .map(b => s"WHEN $b THEN CAST(${1L << (b * PhashBandBits)} AS BIGINT)")
      .mkString(" ")
    s"""
    WITH f AS (
      SELECT doc_id,
        ${phashExprSql("//")} AS phash
      FROM documents WHERE n_chars > 0),
    b AS (
      SELECT doc_id, phash,
        UNNEST([${(0 until PhashBands).mkString(", ")}]) AS band
      FROM f),
    k AS (
      SELECT doc_id, phash, band,
        (phash // (CASE band $divisors END)) % ${1 << PhashBandBits} AS chunk
      FROM b),
    p AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        a.phash AS fa, b.phash AS fb
      FROM k a JOIN k b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(BIT_COUNT(XOR(fa, fb)) AS BIGINT) AS hamming
    FROM p WHERE BIT_COUNT(XOR(fa, fb)) <= $PhashHammingMax"""
  }

  /** [[multimodalPhash]] with the REAL raster branch attempted first
    * (javax.imageio dHash, [[phashImage]]) and the stub fallback for
    * everything else — the decode_real/resize_real pattern: this
    * corpus's payloads are text, so every row falls back and the stub
    * oracle applies, with [[stubParityGuard]] failing LOUD in-plan if a
    * payload ever takes the raster branch. The real branch itself is
    * spec-pinned against constructed in-memory rasters (identity,
    * brightness-shift invariance, content sensitivity).
    */
  def multimodalPhashReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fps = Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        phashImage(bytes) match {
          case Some(fp) => (id, fp, "image/phash")
          case None => (id, phashStub(text),
            if (id % 2 == 0) "image/png" else "audio/wav")
        }
      }).toDF("doc_id", "phash", "media_type")
    phashPairs(
      stubParityGuard(fps, "image/phash", "multimodal_phash_real")
        .drop("media_type"))
  }

  /** Banding-threshold tuning table for the phash near-dup pass — the
    * image twin of dedup_threshold_sweep: from ONE banded candidate
    * pass (the same 4×15-bit band join as [[multimodalPhash]], WITHOUT
    * the verify cut), the pair count at every Hamming ceiling
    * h ∈ {2,4,…,12} — the table that justifies (or moves) the shipped
    * ≤ 10 verdict before an image-dedup pass runs at corpus scale.
    * Pair counts are conditional sums over the distinct candidate set;
    * recall context is the banding pigeonhole documented at
    * [[multimodalPhash]] (h ≤ 3 is exhaustive; above, the banding
    * curve applies to every column of this table equally).
    */
  def phashHammingSweep(spark: SparkSession, dir: String): DataFrame = {
    val cand = phashCandidates(Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), expr(phashExprSql("div")).as("phash")))
    val sums = cand.agg(
      count(lit(1)).as("n_candidate_pairs"),
      PhashSweepCeilings.map(h =>
        sum(when(col("hamming") <= h, 1L).otherwise(0L)).as(s"n_$h")): _*)
    val stackArgs = PhashSweepCeilings
      .map(h => s"CAST($h AS BIGINT), n_$h").mkString(", ")
    sums.select(
      expr(s"stack(${PhashSweepCeilings.size}, $stackArgs) " +
        "AS (hamming_max, n_pairs)"),
      col("n_candidate_pairs"))
  }

  private val PhashSweepCeilings = Seq(2L, 4L, 6L, 8L, 10L, 12L)

  /** [[phashPairs]]' candidate machinery without the Hamming cut — the
    * full banded candidate set the sweep grades (distinct applies after
    * no cut, so every ceiling column reads off one shared set).
    */
  private def phashCandidates(fps: DataFrame): DataFrame =
    phashBandedPairs(fps, cut = None)

  lazy val phashHammingSweepOracle: String = {
    val divisors = (0 until PhashBands)
      .map(b => s"WHEN $b THEN CAST(${1L << (b * PhashBandBits)} AS BIGINT)")
      .mkString(" ")
    val sumCols = PhashSweepCeilings.map(h =>
      s"CAST(SUM(CASE WHEN hamming <= $h THEN 1 ELSE 0 END) AS BIGINT) AS n_$h")
      .mkString(",\n        ")
    val rows = PhashSweepCeilings.map(h =>
      s"SELECT CAST($h AS BIGINT) AS hamming_max, n_$h AS n_pairs, " +
        "n_candidate_pairs FROM s").mkString("\n      UNION ALL ")
    s"""
    WITH f AS (
      SELECT doc_id,
        ${phashExprSql("//")} AS phash
      FROM documents WHERE n_chars > 0),
    b AS (
      SELECT doc_id, phash,
        UNNEST([${(0 until PhashBands).mkString(", ")}]) AS band
      FROM f),
    k AS (
      SELECT doc_id, phash, band,
        (phash // (CASE band $divisors END)) % ${1 << PhashBandBits} AS chunk
      FROM b),
    p AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(BIT_COUNT(XOR(a.phash, b.phash)) AS BIGINT) AS hamming
      FROM k a JOIN k b
        ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
    s AS (
      SELECT COUNT(*) AS n_candidate_pairs,
        $sumCols
      FROM p)
    SELECT hamming_max, n_pairs, n_candidate_pairs FROM ($rows)"""
  }

  /** 16-bit PCM clipping threshold: |s| at or past this counts as a
    * clipped sample (32760 of 32767 — the standard near-full-scale
    * margin that survives dither).
    */
  private[graft] val ClipAbs = 32760L

  /** Clipped-sample statistics over a WAV payload: (n_samples,
    * n_clipped at |s| ≥ [[ClipAbs]]) — the audio-QA fold behind
    * [[multimodalAudioClipReal]]. None when the payload isn't PCM-16
    * WAV (callers fall back to the stub rule).
    */
  private[graft] def clipStats(bytes: Array[Byte]): Option[(Long, Long)] =
    if (!isWav(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val data = in.readAllBytes()
          var i = 0; var n = 0L; var clipped = 0L
          while (i + 1 < data.length) {
            val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toLong
            if (math.abs(s) >= ClipAbs) clipped += 1
            n += 1; i += 2
          }
          Some((n, clipped))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Clipping detection per source, stub form (oracle-checked): the
    * audio-QA gate that rejects hard-limited/overdriven recordings
    * before they enter a speech corpus. The stub plays the payload
    * bytes as 8-bit samples with codes ≥ 120 "clipped" (the top of
    * this corpus's ASCII amplitude range — non-vacuous: z/{|}~ appear
    * unevenly across sources); reported per source as sample counts,
    * clip ppm, and the count of DOCS past 1% clipping (the per-asset
    * reject rule). Scan-speed regexp folds + one tiny aggregate.
    */
  def multimodalAudioClip(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        length(encode(col("text"), "utf-8")).cast("bigint").as("n_samples"),
        regexp_count(col("text"), lit("[x-z{|}~]")).cast("bigint")
          .as("clipped"))
      .withColumn("doc_clip_ppm",
        when(col("n_samples") > 0,
          expr("(clipped * 1000000) div n_samples")).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("clipped")).as("clipped"),
        sum(when(col("doc_clip_ppm") > 10000, 1L).otherwise(0L))
          .as("clipped_docs"))
      .withColumn("clip_ppm",
        when(col("n_samples") > 0,
          expr("(clipped * 1000000) div n_samples")).otherwise(0L))

  val multimodalAudioClipOracle: String = """
    WITH d AS (
      SELECT source,
        CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_samples,
        CAST(LEN(REGEXP_EXTRACT_ALL(text, '[x-z{|}~]')) AS BIGINT)
          AS clipped
      FROM documents),
    p AS (
      SELECT source, n_samples, clipped,
        CASE WHEN n_samples > 0 THEN (clipped * 1000000) // n_samples
          ELSE 0 END AS doc_clip_ppm
      FROM d)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(n_samples) AS BIGINT) AS n_samples,
      CAST(SUM(clipped) AS BIGINT) AS clipped,
      CAST(SUM(CASE WHEN doc_clip_ppm > 10000 THEN 1 ELSE 0 END) AS BIGINT)
        AS clipped_docs,
      CASE WHEN CAST(SUM(n_samples) AS BIGINT) > 0
        THEN (CAST(SUM(clipped) AS BIGINT) * 1000000)
          // CAST(SUM(n_samples) AS BIGINT) ELSE 0 END AS clip_ppm
    FROM p GROUP BY source"""

  /** [[multimodalAudioClip]] with the REAL PCM branch attempted first
    * ([[clipStats]]: |s| ≥ [[ClipAbs]] over 16-bit LE samples) and the
    * stub byte rule as fallback — the decode_real pattern: this corpus
    * is text so every row falls back and the stub oracle applies
    * (plan-asserted); the PCM branch is spec-pinned against hand-built
    * clipped/clean WAVs.
    */
  def multimodalAudioClipReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        clipStats(bytes) match {
          case Some((n, clipped)) => (id, src, "audio/decoded", n, clipped)
          case None =>
            val n = bytes.length.toLong
            // stub amplitude rule: byte codes 120..126 ([x-z{|}~])
            val clipped = bytes.count(b => b >= 120 && b <= 126).toLong
            (id, src, if (id % 2 == 0) "image/png" else "audio/wav",
              n, clipped)
        }
      }).toDF("doc_id", "source", "media_type", "n_samples", "clipped")
    stubParityGuard(rows, "audio/decoded", "multimodal_audio_clip_real")
      .withColumn("doc_clip_ppm",
        when(col("n_samples") > 0,
          expr("(clipped * 1000000) div n_samples")).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("clipped")).as("clipped"),
        sum(when(col("doc_clip_ppm") > 10000, 1L).otherwise(0L))
          .as("clipped_docs"))
      .withColumn("clip_ppm",
        when(col("n_samples") > 0,
          expr("(clipped * 1000000) div n_samples")).otherwise(0L))
  }

  def defs: Map[String, QueryDef] = Map(
    "multimodal_phash_sweep" ->
      QueryDef.sql(phashHammingSweep, phashHammingSweepOracle),
    "multimodal_audio_clip" ->
      QueryDef.sql(multimodalAudioClip, multimodalAudioClipOracle),
    "multimodal_audio_clip_real" ->
      QueryDef.sql(multimodalAudioClipReal, multimodalAudioClipOracle),
    "multimodal_meta" -> QueryDef.sql(multimodalMeta, multimodalMetaOracle),
    "multimodal_decode" -> QueryDef.sql(multimodalDecode, multimodalDecodeOracle),
    "multimodal_decode_real" ->
      QueryDef.sql(multimodalDecodeReal, multimodalDecodeOracle),
    "multimodal_frame_sample" -> QueryDef.sql(multimodalFrameSample, multimodalFrameSampleOracle),
    "multimodal_frame_sample_real" ->
      QueryDef.sql(multimodalFrameSampleReal, multimodalFrameSampleOracle),
    "multimodal_resize" -> QueryDef.sql(multimodalResize, multimodalResizeOracle),
    "multimodal_resize_real" ->
      QueryDef.sql(multimodalResizeReal, multimodalResizeRealOracle),
    "multimodal_phash" -> QueryDef.sql(multimodalPhash, multimodalPhashOracle),
    "multimodal_phash_real" ->
      QueryDef.sql(multimodalPhashReal, multimodalPhashOracle),
    "multimodal_audio" -> QueryDef.sql(multimodalAudio, multimodalAudioOracle),
    "multimodal_audio_real" ->
      QueryDef.sql(multimodalAudioReal, multimodalAudioOracle)
  )
}
