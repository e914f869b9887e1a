package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attachBinary produces opaque payload with typed metadata") {
    val m = Multimodal.attachBinary(Tables.load(spark, sf, "documents"),
      "doc_id", "text")
    assert(m.schema("media").dataType.typeName == "binary")
    assert(m.count() == 500)
  }

  test("feature pipeline yields fixed-length normalized histograms") {
    val feats = Multimodal.featurePipeline(spark,
      Tables.load(spark, sf, "documents").limit(50))
    val rows = feats.as[Multimodal.MediaFeatures].collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0f) < 1e-3)
      assert(r.checksum.length == 64)
      assert(r.n_bytes > 0)
    }
  }

  test("decode stub is deterministic") {
    val b = "same bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq == Multimodal.decodeStub(b).toSeq)
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImage reads a real PNG's geometry and luminance histogram") {
    val black = Multimodal.decodeImage(pngBytes(8, 6, 0x000000)).get
    assert(black.width == 8 && black.height == 6)
    assert(black.features(0) == 1.0f, "all-black → everything in bin 0")
    val white = Multimodal.decodeImage(pngBytes(3, 5, 0xFFFFFF)).get
    assert(white.width == 3 && white.height == 5)
    assert(white.features(15) == 1.0f, "all-white → everything in bin 15")
    // mid-gray 0x808080: lum = 128 → bin 128*16/256 = 8
    val gray = Multimodal.decodeImage(pngBytes(4, 4, 0x808080)).get
    assert(gray.features(8) == 1.0f)
    // a non-image payload is None, and decode() falls back to the stub
    val junk = "not an image".getBytes("UTF-8")
    assert(Multimodal.decodeImage(junk).isEmpty)
    assert(Multimodal.decode(junk).toSeq == Multimodal.decodeStub(junk).toSeq)
  }

  test("extractFeatures routes real PNG payloads through the real decoder") {
    import spark.implicits._
    val png = pngBytes(8, 6, 0xFFFFFF)
    val src = Seq(
      Multimodal.MediaRow(1L, png, "image/png", 8, 6),
      Multimodal.MediaRow(2L, "plain text".getBytes("UTF-8"), "text", 0, 0))
      .toDS()
    val feats = Multimodal.extractFeatures(src).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).features(15) == 1.0f, "white PNG decoded for real")
    assert(feats(2L).features.toSeq ==
      Multimodal.decodeStub("plain text".getBytes("UTF-8")).toSeq)
  }

  test("resize keeps payload and metadata in lockstep") {
    import spark.implicits._
    val src = Seq(
      Multimodal.MediaRow(1L, Array.tabulate(64 * 64)(_.toByte), "img", 64, 64),
      Multimodal.MediaRow(2L, Array.emptyByteArray, "img", 64, 64)).toDS()
    val out = Multimodal.resize(src, 16, 16).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).media.length == 16 * 16)
    assert(out(1L).width == 16 && out(1L).height == 16)
    // nearest-neighbor: out(0,0) is in(0,0); out(15,15) maps to in(60,60)
    assert(out(1L).media(0) == 0.toByte)
    assert(out(1L).media(255) == (60 * 64 + 60).toByte)
    // payload shorter than geometry (or empty) zero-fills, never throws
    assert(out(2L).media.length == 16 * 16 && out(2L).media.forall(_ == 0))
  }

  test("corrupt/truncated payloads degrade to the stub — the job survives " +
      "adversarial rows") {
    import spark.implicits._
    // valid PNG signature + header, truncated mid-IDAT: a reader IS
    // found, read(0) throws, the throw is contained
    val truncated = pngBytes(8, 8, 0x123456).take(40)
    assert(Multimodal.decodeImage(truncated).isEmpty)
    assert(Multimodal.decode(truncated).toSeq ==
      Multimodal.decodeStub(truncated).toSeq)
    // pure garbage that is not any image format
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(Multimodal.decodeImage(garbage).isEmpty)
    // end-to-end: a partition containing both adversarial rows completes
    val src = Seq(
      Multimodal.MediaRow(1L, truncated, "image/png", 8, 8),
      Multimodal.MediaRow(2L, garbage, "bin", 0, 0),
      Multimodal.MediaRow(3L, pngBytes(4, 4, 0xFFFFFF), "image/png", 4, 4))
      .toDS()
    val feats = Multimodal.extractFeatures(src).collect()
    assert(feats.length == 3)
    assert(feats.find(_.doc_id == 3L).get.features(15) == 1.0f,
      "the valid row still decodes for real")
  }

  /** A syntactically valid PNG header (correct signature, IHDR chunk
    * with a correct CRC) declaring a `w`×`h` canvas — and nothing else.
    * 33 bytes that claim to be 10 gigapixels.
    */
  private def hugeHeaderPng(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte).put(2.toByte) // bit depth 8, truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val body = ihdr.array()
    val crc = new java.util.zip.CRC32
    crc.update(body)
    val len = java.nio.ByteBuffer.allocate(4).putInt(13).array()
    out.write(len); out.write(body)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    out.toByteArray
  }

  test("a tiny payload declaring a gigapixel canvas is rejected before " +
      "the pixel buffer is allocated") {
    val bomb = hugeHeaderPng(100000, 100000) // 10 GPix ≈ 40 GB ARGB
    assert(bomb.length < 50, "the attack payload itself is tiny")
    // must return None fast without attempting the 40 GB allocation
    assert(Multimodal.decodeImage(bomb).isEmpty)
    assert(Multimodal.resizeImage(bomb, 4, 4).isEmpty)
    // within-limit header with truncated data still degrades cleanly
    assert(Multimodal.decodeImage(hugeHeaderPng(16, 16)).isEmpty)
  }

  test("real bilinear resize: true PNG out at target geometry, luminance " +
      "preserved") {
    // left half black, right half white
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val resized = Multimodal.resizeImage(png, 8, 8).get
    val dec = Multimodal.decodeImage(resized).get
    assert(dec.width == 8 && dec.height == 8, "output is a real 8x8 PNG")
    def meanLum(f: Array[Float]): Double =
      f.zipWithIndex.map { case (v, i) => v * (i + 0.5) / 16 }.sum
    val before = meanLum(Multimodal.decodeImage(png).get.features)
    val after = meanLum(dec.features)
    assert(math.abs(before - after) < 0.1,
      s"luminance histogram drifted: $before -> $after")
    // halves survive: ~half the pixels dark, ~half bright (bilinear
    // blending only affects the boundary column)
    assert(dec.features(0) >= 0.3f && dec.features(15) >= 0.3f)

    // the Dataset-level resize routes decodable payloads through the
    // real path: the output re-decodes at the target geometry
    import spark.implicits._
    val out = Multimodal.resize(
      Seq(Multimodal.MediaRow(1L, png, "image/png", 16, 16)).toDS(), 8, 8)
      .collect().head
    assert(out.width == 8 && out.height == 8)
    assert(Multimodal.decodeImage(out.media).get.width == 8)
  }

  test("frame sampling explodes one row per frame with monotone timestamps") {
    import spark.implicits._
    val payload = Array.tabulate(10 * 4)(_.toByte) // 10 frames of 4 bytes
    val src = Seq(
      Multimodal.MediaRow(7L, payload, "video", 2, 2),
      Multimodal.MediaRow(8L, Array[Byte](1, 2), "video", 2, 2)) // < 1 frame
      .toDS()
    val frames = Multimodal.sampleFrames(src, frameIntervalMs = 40,
      frameBytes = 4).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(7L).length == 10)
    assert(byDoc(7L).sortBy(_.frame_idx).map(_.frame_ts_ms).toSeq ==
      (0 until 10).map(_ * 40L))
    // frames reassemble to the original payload (stub slicing is lossless)
    assert(byDoc(7L).sortBy(_.frame_idx).flatMap(_.frame).toSeq ==
      payload.toSeq)
    // a payload smaller than one frame still yields exactly one row
    assert(byDoc(8L).length == 1 && byDoc(8L).head.frame.toSeq == Seq[Byte](1, 2))
  }

  /** In-memory animated GIF: one solid 4×4 frame per rgb value, a
    * shared inter-frame delay in centiseconds (GIF's native unit).
    */
  private def gifBytes(rgbs: Seq[Int], delayCs: Int): Array[Byte] = {
    val ios = new java.io.ByteArrayOutputStream()
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = javax.imageio.ImageIO.createImageOutputStream(ios)
    try {
      writer.setOutput(out)
      val params = writer.getDefaultWriteParam
      writer.prepareWriteSequence(null)
      rgbs.foreach { rgb =>
        val img = new java.awt.image.BufferedImage(4, 4,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
        val md = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img), params)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val existing = tree.getElementsByTagName("GraphicControlExtension")
        val gce =
          if (existing.getLength > 0)
            existing.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode(
              "GraphicControlExtension")
            n.setAttribute("disposalMethod", "none")
            n.setAttribute("userInputFlag", "FALSE")
            n.setAttribute("transparentColorFlag", "FALSE")
            n.setAttribute("transparentColorIndex", "0")
            tree.appendChild(n)
            n
          }
        gce.setAttribute("delayTime", delayCs.toString)
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), params)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); out.close() }
    ios.toByteArray
  }

  test("decodeFrames reads an animated GIF: per-frame PNGs with " +
      "cumulative delay timestamps") {
    val gif = gifBytes(Seq(0x000000, 0xFFFFFF, 0x000000), delayCs = 5)
    val frames = Multimodal.decodeFrames(gif).get
    assert(frames.map(_.frame_idx) == Vector(0, 1, 2))
    assert(frames.map(_.frame_ts_ms) == Vector(0L, 50L, 100L),
      "delayTime=5cs accumulates as 50 ms steps")
    // every frame re-decodes as a real image at the true geometry
    val decoded = frames.map(f => Multimodal.decodeImage(f.png).get)
    assert(decoded.forall(d => d.width == 4 && d.height == 4))
    assert(decoded(0).features(0) == 1.0f, "frame 0 is black")
    assert(decoded(1).features(15) == 1.0f, "frame 1 is white")
    // single-frame images are NOT animations — decodeImage's domain
    assert(Multimodal.decodeFrames(pngBytes(4, 4, 0x000000)).isEmpty)
    // non-image payloads fall through to the stub contract
    assert(Multimodal.decodeFrames("plain text".getBytes("UTF-8")).isEmpty)
    // truncated mid-stream: contained, degrades to None
    assert(Multimodal.decodeFrames(gif.take(gif.length / 2)).isEmpty)
  }

  test("sampleFrames routes animated GIFs through the real decoder with " +
      "interval sampling; opaque payloads keep the stub contract") {
    import spark.implicits._
    // 5 frames at 40 ms: interval 80 keeps ts 0, 80, 160
    val gif = gifBytes(
      Seq(0x000000, 0xFFFFFF, 0x000000, 0xFFFFFF, 0x000000), delayCs = 4)
    val src = Seq(
      Multimodal.MediaRow(1L, gif, "image/gif", 4, 4),
      Multimodal.MediaRow(2L, Array.tabulate(8)(_.toByte), "video", 2, 2))
      .toDS()
    val byDoc = Multimodal.sampleFrames(src, frameIntervalMs = 80,
      frameBytes = 4).collect().groupBy(_.doc_id)
    val real = byDoc(1L).sortBy(_.frame_idx)
    assert(real.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    assert(real.map(_.frame_ts_ms).toSeq == Seq(0L, 80L, 160L))
    assert(real.forall(f => Multimodal.decodeImage(f.frame).get.width == 4),
      "sampled frames are true PNGs")
    // opaque payload: unchanged stub slicing (2 windows of 4 bytes)
    assert(byDoc(2L).length == 2)
    // interval 0 keeps every frame
    assert(Multimodal.sampleByInterval(
      Multimodal.decodeFrames(gif).get, 0).length == 5)
  }

  /** In-memory mono 16-bit PCM WAV of a sine at `freqHz`. */
  private def wavBytes(freqHz: Double, ms: Int,
                       rate: Float = 8000f): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freqHz * i / rate) * 16384).toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio reads a real WAV: geometry, RMS, zero-crossing rate, " +
      "amplitude histogram") {
    // 400 Hz sine, 1 s at 8 kHz: rms = (16384/32768)/√2, zcr = 2·f/rate
    val wav = wavBytes(400.0, 1000)
    val a = Multimodal.decodeAudio(wav).get
    assert(a.sample_rate == 8000f && a.channels == 1)
    assert(a.n_frames == 8000L && a.duration_ms == 1000L)
    assert(math.abs(a.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=${a.rms}")
    assert(math.abs(a.zero_cross_rate - 2 * 400.0 / 8000) < 0.01,
      s"zcr=${a.zero_cross_rate}")
    assert(math.abs(a.features.sum - 1.0f) < 1e-3)
    // silence: degenerate but valid
    val silent = Multimodal.decodeAudio(wavBytes(0.0, 100)).get
    assert(silent.rms == 0f && silent.zero_cross_rate == 0f)
    assert(silent.features(0) == 1.0f, "all samples in the zero bin")
    // non-audio payloads are None; decode() routes WAVs for real
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decode(wav).toSeq == a.features.toSeq)
    assert(Multimodal.decode(wav).toSeq != Multimodal.decodeStub(wav).toSeq)
  }

  /** Gradient test image with optional per-pixel perturbation. */
  private def gradientPng(w: Int, h: Int, tweak: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, (x * 256 / w + tweak).max(0))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash is perceptual: stable across scaling and small edits, far " +
      "for different content, None for opaque payloads") {
    val base = Multimodal.aHash(gradientPng(64, 64)).get
    // the same content at a different resolution hashes identically
    assert(Multimodal.aHash(gradientPng(32, 32)).get == base)
    // a small brightness tweak stays within a few bits
    val tweaked = Multimodal.aHash(gradientPng(64, 64, tweak = 6)).get
    assert(java.lang.Long.bitCount(base ^ tweaked) <= 3,
      s"small edit moved ${java.lang.Long.bitCount(base ^ tweaked)} bits")
    // reversed gradient is far away
    val reversed = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = 255 - x * 256 / 64
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      Multimodal.aHash(out.toByteArray).get
    }
    assert(java.lang.Long.bitCount(base ^ reversed) > 16)
    assert(Multimodal.aHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageDupPairs: banded hamming join finds near-dup images, " +
      "lossless for distance <= maxHamming") {
    import spark.implicits._
    val src = Seq(
      Multimodal.MediaRow(1L, gradientPng(64, 64), "image/png", 64, 64),
      Multimodal.MediaRow(2L, gradientPng(32, 32), "image/png", 32, 32),
      Multimodal.MediaRow(3L, gradientPng(64, 64, tweak = 6), "image/png", 64, 64),
      Multimodal.MediaRow(4L, pngBytes(16, 16, 0xFFFFFF), "image/png", 16, 16),
      Multimodal.MediaRow(5L, "opaque".getBytes("UTF-8"), "bin", 0, 0))
      .toDS()
    val hashes = Multimodal.imageHashes(src)
    assert(hashes.count() == 4, "opaque payload contributes no hash")
    val pairs = Multimodal.imageDupPairs(hashes.toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical content at two scales")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      "small edit within the hamming budget")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated image must not pair")
    // losslessness vs the exact all-pairs ground truth
    val hs = hashes.collect().map(h => h.doc_id -> h.hash)
    val exact = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs == exact, s"banded join disagreed with exact: $pairs vs $exact")
  }

  test("sampleAudioWindows explodes real audio into per-window energy " +
      "rows; non-audio payloads contribute none") {
    import spark.implicits._
    // 400 ms at 8 kHz: first 200 ms a 400 Hz sine, then silence
    val n = 3200
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val s = (math.sin(2 * math.Pi * 400 * i / 8000.0) * 16384).toShort
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val src = Seq(
      Multimodal.MediaRow(1L, bos.toByteArray, "audio/wav", 0, 0),
      Multimodal.MediaRow(2L, "not audio".getBytes("UTF-8"), "bin", 0, 0))
      .toDS()
    val windows = Multimodal.sampleAudioWindows(src, windowMs = 100)
      .collect().sortBy(w => (w.doc_id, w.window_idx))
    assert(windows.forall(_.doc_id == 1L), "opaque payload yields no rows")
    assert(windows.length == 4, "400 ms / 100 ms windows")
    assert(windows.map(_.window_ts_ms).toSeq == Seq(0L, 100L, 200L, 300L))
    // energy boundary: first two windows loud, last two silent
    assert(windows(0).rms > 0.3f && windows(1).rms > 0.3f)
    assert(windows(2).rms == 0f && windows(3).rms == 0f)
    assert(windows(0).zero_cross_rate > 0.05f)
    assert(windows(3).zero_cross_rate == 0f)
  }

  test("a WAV header declaring an absurd stream is rejected before the " +
      "sample buffer is read") {
    // patch the data-chunk and RIFF sizes of a tiny valid WAV to claim
    // ~2 GB of samples: the header-first frame-count guard must reject
    // without attempting to materialize them
    val wav = wavBytes(400.0, 10)
    def indexOf(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      (0 until wav.length - p.length).find(i =>
        p.indices.forall(j => wav(i + j) == p(j))).get
    }
    def patchLe(at: Int, v: Long): Unit =
      for (j <- 0 until 4) wav(at + j) = ((v >> (8 * j)) & 0xFF).toByte
    patchLe(indexOf("RIFF") + 4, 0x7FFFFFF0L)
    patchLe(indexOf("data") + 4, 0x7FFFFF00L)
    assert(Multimodal.decodeAudio(wav).isEmpty,
      "declared 2 GB stream must fail the MaxDecodeSamples gate")
    // truncated WAV (header cut mid-fmt): contained, None
    assert(Multimodal.decodeAudio(wavBytes(400.0, 10).take(16)).isEmpty)
  }
}
