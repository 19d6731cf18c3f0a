package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions.{col, expr}

/** Exercises the multimodal binary-column pipeline: schema, determinism,
  * and batch shape of the (stubbed) decode stage.
  */
class MultimodalSpec extends SparkSpec {

  test("decodeStub yields typed features for every document") {
    val ds = Multimodal.decodeStub(spark, sfDir)
    val rows = ds.collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { m =>
      assert(m.features.length == 8)
      assert(m.width >= 16 && m.width < 80)
      assert(m.height >= 16 && m.height < 80)
      assert(m.n_bytes > 0)
      assert(m.media_type == (if (m.doc_id % 2 == 0) "image/png" else "audio/wav"))
    }
  }

  test("decodeStub is deterministic across runs") {
    val a = Multimodal.decodeStub(spark, sfDir).collect()
      .map(m => (m.doc_id, m.width, m.height, m.features.toSeq)).sortBy(_._1)
    val b = Multimodal.decodeStub(spark, sfDir).collect()
      .map(m => (m.doc_id, m.width, m.height, m.features.toSeq)).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("frame sampling takes exactly every 4th frame, features normalized") {
    import org.apache.spark.sql.functions._
    val df = Multimodal.multimodalFrameSample(spark, sfDir).persist()
    assert(df.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() == 0,
      "only stride-aligned frames may be sampled")
    // per doc: sampled count == ceil(n_frames / stride)
    val bad = df.groupBy(col("doc_id"), col("n_frames"))
      .agg(count(lit(1)).as("sampled"))
      .filter(col("sampled") =!= expr("(n_frames + 3) div 4"))
    assert(bad.count() == 0, "sampled-frame count must be ceil(n_frames/4)")
    assert(df.filter(col("f0") < 0 || col("f0") > 1).count() == 0)
    df.unpersist()
  }

  test("resize dims agree with decodeStub's JVM dims per document (no geometry drift)") {
    import org.apache.spark.sql.functions._
    val jvm = Multimodal.decodeStub(spark, sfDir)
      .collect().map(m => m.doc_id -> (m.width.toLong, m.height.toLong)).toMap
    val sqlSide = Multimodal.multimodalResize(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("width"), r.getAs[Long]("height"))).toMap
    assert(sqlSide == jvm,
      "stubWidth/stubHeight Columns must reproduce decodeStub's dimensions exactly")
  }

  test("resize plan fits the 64-box, preserves orientation, floors at 1") {
    import org.apache.spark.sql.functions._
    val df = Multimodal.multimodalResize(spark, sfDir).persist()
    assert(df.filter(greatest(col("out_width"), col("out_height")) =!= 64).count() == 0,
      "the larger dimension must map exactly onto the box edge")
    assert(df.filter(col("out_width") < 1 || col("out_height") < 1).count() == 0)
    val flipped = df.filter(
      (col("width") > col("height") && col("out_width") < col("out_height")) ||
        (col("width") < col("height") && col("out_width") > col("out_height")))
    assert(flipped.count() == 0, "resize must not flip the aspect orientation")
    df.unpersist()
  }

  /** Encode a BufferedImage to real container bytes in memory. */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("decodeFeatures: real PNG/JPEG payloads decode to true dimensions " +
      "through the mapPartitions stage") {
    import spark.implicits._
    val payloads = Seq(
      1L -> imageBytes(37, 21, "png"),
      2L -> imageBytes(64, 128, "jpg"),
      3L -> "just text, not an image".getBytes("UTF-8"))
    val out = Multimodal.decodeFeatures(payloads.toDS())
      .collect().map(m => m.doc_id -> m).toMap
    assert(out(1L).media_type == "image/decoded")
    assert((out(1L).width, out(1L).height) == ((37, 21)), "real PNG dims")
    assert((out(2L).width, out(2L).height) == ((64, 128)), "real JPEG dims")
    // luminance histogram: 8 non-negative shares summing to ~1
    val feats = out(1L).features
    assert(feats.length == 8 && feats.forall(_ >= 0f))
    assert(math.abs(feats.sum - 1f) < 1e-3, s"shares must sum to 1: ${feats.sum}")
    // non-raster payload rides the deterministic stub fallback
    val textBytes = payloads(2)._2
    assert(out(3L).width == 16 + textBytes.length % 64
      && out(3L).media_type == "audio/wav", "stub fallback for non-raster")
  }

  test("decodeFeatures: corrupt raster bytes degrade to the stub, not a crash") {
    import spark.implicits._
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x00, 0x01, 0x02)
    val out = Multimodal.decodeFeatures(Seq(9L -> corrupt).toDS()).collect()
    assert(out.length == 1 && out.head.media_type != "image/decoded",
      "unparseable PNG must fall back to the stub row")
    assert(out.head.n_bytes == corrupt.length.toLong)
  }

  test("multimodal_decode_real equals the stub stage on the text-backed corpus") {
    // no synthetic payload sniffs as raster, so the real-codec stage must
    // reproduce the oracle-checked stub output bit-for-bit
    val a = Multimodal.multimodalDecode(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    val b = Multimodal.multimodalDecodeReal(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    assert(a == b, "real-codec stage diverged from stub on non-raster corpus")
  }

  test("resizeFeatures: integer-multiple downscale equals the disjoint-block " +
      "average (independent reference arithmetic)") {
    import spark.implicits._
    // 128×96 fits the 64-box at exactly 64×48: every output pixel owns a
    // disjoint 2×2 source block, so a straightforward block-mean is an
    // INDEPENDENT reference for the area-average resampler.
    val w = 128; val h = 96
    val bytes = imageBytes(w, h, "png")
    val out = Multimodal.resizeFeatures(Seq(1L -> bytes).toDS()).collect().head
    assert(out.media_type == "image/resized")
    assert((out.width, out.height) == ((w, h)))
    assert((out.out_width, out.out_height) == ((64, 48)), "fit-box dims")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val ref = new Array[Float](8)
    for (y <- 0 until 48; x <- 0 until 64) {
      var rs = 0L; var gs = 0L; var bs = 0L
      for (dy <- 0 until 2; dx <- 0 until 2) {
        val rgb = img.getRGB(x * 2 + dx, y * 2 + dy)
        rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
      }
      val lum = ((rs / 4) * 299 + (gs / 4) * 587 + (bs / 4) * 114) / 1000
      ref(math.min(7, (lum / 32).toInt)) += 1f / (64 * 48)
    }
    (0 until 8).foreach { i =>
      assert(math.abs(out.features(i) - ref(i)) < 1e-6f,
        s"bin $i: got ${out.features(i)}, reference ${ref(i)}")
    }
  }

  test("resizeFeatures: upscale clamps blocks to nearest-neighbor, shares sum to 1") {
    import spark.implicits._
    // 10×5 → box 64: m=10 ⇒ 64×32 output, source blocks degenerate
    val out = Multimodal.resizeFeatures(
      Seq(2L -> imageBytes(10, 5, "png")).toDS()).collect().head
    assert((out.width, out.height) == ((10, 5)))
    assert((out.out_width, out.out_height) == ((64, 32)), "upscale fit-box dims")
    assert(out.features.forall(_ >= 0f)
      && math.abs(out.features.sum - 1f) < 1e-3)
  }

  test("resizeFeatures: non-raster and corrupt payloads ride the stub geometry") {
    import spark.implicits._
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x00, 0x01)
    val text = "not an image".getBytes("UTF-8")
    val out = Multimodal.resizeFeatures(Seq(7L -> corrupt, 8L -> text).toDS())
      .collect().map(m => m.doc_id -> m).toMap
    out.values.foreach { m =>
      assert(m.media_type != "image/resized", "stub fallback expected")
      assert(m.width == 16 + (if (m.doc_id == 7L) corrupt.length else text.length) % 64)
      assert(math.max(m.out_width, m.out_height) == 64
        && m.out_width >= 1 && m.out_height >= 1, "stub fit-box geometry")
    }
  }

  test("multimodal_resize_real agrees with the geometry plan and stub " +
      "features on the text-backed corpus") {
    val geo = Multimodal.multimodalResize(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("out_width"), r.getAs[Long]("out_height"))).toMap
    val real = Multimodal.multimodalResizeReal(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h, ow, oh) = geo(id)
      assert((r.getAs[Int]("width").toLong, r.getAs[Int]("height").toLong,
        r.getAs[Int]("out_width").toLong, r.getAs[Int]("out_height").toLong)
        == ((w, h, ow, oh)), s"geometry drift for doc $id")
    }
    // features equal the decode stub's byte features row-for-row
    val stubF = Multimodal.multimodalDecode(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(i => r.getAs[Float](s"f$i"))).toMap
    real.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert((0 until 8).map(i => r.getAs[Float](s"f$i")) == stubF(id),
        s"stub feature drift for doc $id")
    }
  }

  /** Encode an animated GIF (n distinct frames) to bytes in memory. */
  private def gifBytes(w: Int, h: Int, n: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until n) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 7 + y * 13 + f * 41) % 256) * 0x010101)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  test("frameSamples: a real animated GIF yields every 4th stored frame " +
      "with distinct pixel fingerprints") {
    import spark.implicits._
    val nFrames = 10
    val payloads = Seq(
      1L -> gifBytes(16, 12, nFrames),
      2L -> ("x" * 200).getBytes("UTF-8"))
    val out = Multimodal.frameSamples(payloads.toDS()).collect()
      .groupBy(_.doc_id)
    val gif = out(1L).sortBy(_.frame_idx)
    assert(gif.forall(_.media_type == "video/gif-frames"))
    assert(gif.map(_.frame_idx).toSeq == Seq(0L, 4L, 8L),
      s"stride-4 sampling of $nFrames frames: ${gif.map(_.frame_idx).toSeq}")
    assert(gif.forall(_.n_frames == nFrames.toLong))
    // distinct frame content → distinct pixel fingerprints, and f0 is
    // the shared md5-derived share in [0, 1]
    assert(gif.map(_.frame_md5).distinct.length == 3, "frame md5 collided")
    assert(gif.forall(f => f.f0 >= 0.0 && f.f0 <= 1.0))
    // decoding is deterministic: same payload, same fingerprints
    val again = Multimodal.frameSamples(payloads.toDS()).collect()
      .groupBy(_.doc_id)(1L).sortBy(_.frame_idx)
    assert(again.map(_.frame_md5).toSeq == gif.map(_.frame_md5).toSeq)
    // the text payload rides the char-frame stub in the same stage
    val stub = out(2L)
    assert(stub.forall(_.media_type == "text/frames")
      && stub.map(_.frame_idx).sorted.toSeq == Seq(0L, 4L),
      "200 chars = 6 full frames, sampled at 0 and 4")
    // corrupt GIF bytes degrade to the stub, never crash the task
    val corrupt = "GIF8" + ""
    val deg = Multimodal.frameSamples(
      Seq(3L -> (corrupt * 20).getBytes("UTF-8")).toDS()).collect()
    assert(deg.forall(_.media_type == "text/frames"))
  }

  test("multimodal_frame_sample_real equals the stub stage on the " +
      "text-backed corpus") {
    val a = Multimodal.multimodalFrameSample(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) -> r.toSeq)
      .toMap
    val b = Multimodal.multimodalFrameSampleReal(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")) -> r.toSeq)
      .toMap
    assert(a == b, "real-codec frame stage diverged from stub on the corpus")
  }

  test("stubParityGuard fails loud when a row proves the real branch ran") {
    import spark.implicits._
    val df = Seq((1L, "image/png"), (2L, "image/resized"))
      .toDF("doc_id", "media_type")
    val e = intercept[Exception] {
      Multimodal.stubParityGuard(df, "image/resized", "op_under_test").count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("op_under_test")
      || m.contains("stub-parity")), s"unclear guard failure: ${messages(e)}")
    // and passes silently when the corpus property holds
    assert(Multimodal.stubParityGuard(
      Seq((1L, "image/png")).toDF("doc_id", "media_type"),
      "image/resized", "op_under_test").count() == 1L)
  }

  /** A raster with controllable gradient content for the phash pins. */
  private def gradientImage(w: Int, h: Int, base: Int, slope: Int,
      fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // keep channels in [base, base+|slope|·w] ≪ 255 so a brightness
      // shift cannot clamp and perturb gradient SIGNS
      val v = math.min(255, math.max(0, base + x * slope / math.max(1, w / 8)))
      img.setRGB(x, y, v * 0x010101)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("phashImage: re-encode and brightness-shift invariant, content " +
      "sensitive, text falls through") {
    val a = Multimodal.phashImage(gradientImage(96, 40, 40, 12, "png"))
    assert(a.nonEmpty, "PNG must take the raster branch")
    // identical pixels, different container → identical fingerprint
    val bmp = Multimodal.phashImage(gradientImage(96, 40, 40, 12, "bmp"))
    assert(bmp == a, "dHash must survive re-encoding")
    // uniform brightness shift preserves every gradient sign → same fp
    val brighter = Multimodal.phashImage(gradientImage(96, 40, 90, 12, "png"))
    assert(brighter == a, "dHash must survive a uniform brightness shift")
    // reversed gradient flips every horizontal comparison → far apart
    val reversed = Multimodal.phashImage(gradientImage(96, 40, 160, -12, "png"))
    assert(reversed.nonEmpty && reversed != a)
    val ham = java.lang.Long.bitCount(a.get ^ reversed.get)
    assert(ham > 10, s"reversed gradient landed within the near-dup cut: $ham")
    // non-raster bytes refuse the branch (stub fallback at the call site)
    assert(Multimodal.phashImage("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("phashStub: the scalar and the generated SQL expression agree " +
      "character-for-character") {
    import spark.implicits._
    val texts = Seq("a", "ab", "the quick brown fox jumps over the lazy dog",
      "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg",
      ("lorem ipsum dolor sit amet " * 40).trim)
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val got = df.select(col("doc_id"),
        expr(Multimodal.phashExprSql("div")).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == Multimodal.phashStub(t),
        s"stub parity broke for text #$i")
    }
  }

  /** 16-bit signed little-endian mono WAV bytes from a PCM sample seq. */
  private def wavBytes(rate: Float, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeWav: rate/frames/duration/RMS pin against hand-built PCM; " +
      "text refuses the branch") {
    // a constant-amplitude square wave has a CLOSED-FORM RMS = |amp|
    val square = Array.tabulate(8000)(i =>
      if (i % 2 == 0) 1000.toShort else (-1000).toShort)
    val got = Multimodal.decodeWav(wavBytes(8000f, square))
    assert(got.contains((8000L, 8000L, 1000L, 1000L)),
      s"square-wave pin: $got")
    // silence: same container facts, zero energy
    val silence = Multimodal.decodeWav(wavBytes(16000f, new Array[Short](4000)))
    assert(silence.contains((16000L, 4000L, 250L, 0L)), s"silence pin: $silence")
    // mixed amplitudes: RMS = floor(sqrt(mean of squares)) exactly
    val mixed = Array[Short](300, -400, 0, 500)
    val wantRms = math.floor(math.sqrt(
      mixed.map(s => s.toLong * s).sum.toDouble / mixed.length)).toLong
    assert(Multimodal.decodeWav(wavBytes(8000f, mixed))
      .exists(_._4 == wantRms))
    // non-WAV bytes refuse the branch (stub fallback at the call site)
    assert(Multimodal.decodeWav("not audio at all".getBytes("UTF-8")).isEmpty)
  }

  test("multimodal_audio_real ≡ multimodal_audio on a text-only corpus") {
    val stub = Multimodal.multimodalAudio(spark, sfDir).collect()
      .map(_.toString).sorted
    val real = Multimodal.multimodalAudioReal(spark, sfDir).collect()
      .map(_.toString).sorted
    assert(stub.nonEmpty && stub.sameElements(real),
      "the codec-aware form must equal the stub form when nothing decodes")
  }

  test("multimodal_phash_real ≡ multimodal_phash on a text-only corpus") {
    val stub = Multimodal.multimodalPhash(spark, sfDir).collect()
      .map(_.toString).sorted
    val real = Multimodal.multimodalPhashReal(spark, sfDir).collect()
      .map(_.toString).sorted
    assert(stub.nonEmpty, "phash must find near-dup pairs at this SF")
    assert(stub.sameElements(real),
      "the raster-aware form must equal the stub form when nothing rasters")
  }
}
