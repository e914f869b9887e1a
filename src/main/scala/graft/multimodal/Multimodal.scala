package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a partition-parallel feature
  * extraction stage.
  *
  * The Spark-side plumbing is real and tested — schema, batch iteration,
  * partition sizing — while the actual media decode is STUBBED
  * (`decodeStub`): codec libraries are not available in this
  * environment, and the decode is the only per-element black box. In
  * production the stub body is replaced by the real decoder (JNI/
  * javacpp) with the identical signature; nothing else changes.
  *
  * Scale notes: media bytes travel inside the row (parquet binary), so
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per task;
  * feature extraction is `mapPartitions` so any per-partition init
  * (model load, decoder context) is amortized across the partition —
  * the Scala twin of `mapInPandas` batching.
  */
object Multimodal {

  /** Typed media row: id + opaque payload + metadata. */
  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String,
                            width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 checksum: String, features: Array[Float])

  /** Attach a binary media column derived from text (the fixture corpus
    * has no real media; UTF-8 bytes stand in as the opaque payload).
    */
  def attachBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("application/x-fake").as("kind"),
      lit(64).as("width"), lit(64).as("height"))

  /** A really-decoded image: true pixel geometry + luminance histogram. */
  final case class DecodedImage(width: Int, height: Int,
                                features: Array[Float])

  /** Pixel-count ceiling for [[decodeImage]]: payloads whose header
    * declares more pixels than this are rejected BEFORE the pixel
    * buffer is allocated. 64 MPix ≈ 256 MB ARGB — far above any sane
    * training-corpus image, far below an executor-killing allocation.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Real pure-JVM image decode (PNG/JPEG/GIF/BMP via `javax.imageio` —
    * no native codec libraries needed): bytes → true width/height + a
    * `bins`-bucket normalized luminance histogram (ITU-R BT.601 integer
    * weights). Returns None when the payload is not a parseable image,
    * so [[decode]] can fall back to the byte-histogram stub for opaque
    * or fixture payloads.
    *
    * Hardened for untrusted corpora: dimensions are read from the
    * format header FIRST and checked against [[MaxDecodePixels]] — a
    * 100-byte payload declaring a 100k×100k canvas is rejected without
    * allocating the pixel buffer — and ALL decoder throws are contained
    * (ImageIO plugins raise RuntimeExceptions, not just IOException, on
    * truncated/corrupt data), so one adversarial row degrades to the
    * stub path instead of failing the job.
    */
  /** The hardened bytes→BufferedImage read shared by [[decodeImage]]
    * and [[resizeImage]]: null-checked stream, header-first dimension
    * guard, reader disposed and the input stream closed on EVERY path
    * (a no-matching-reader payload must not leak the stream — with
    * ImageIO's default disk-backed cache that is a temp file + fd per
    * row), all decoder throws contained.
    */
  private def readImage(media: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      if (iis == null) None
      else {
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val (w, h) = (reader.getWidth(0), reader.getHeight(0))
              if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) None
              else Option(reader.read(0))
                .filter(i => i.getWidth > 0 && i.getHeight > 0)
            } finally reader.dispose()
          }
        } finally iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def decodeImage(media: Array[Byte], bins: Int = 16): Option[DecodedImage] =
    readImage(media).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val hist = new Array[Float](bins)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          hist(lum * bins / 256) += 1f
          x += 1
        }
        y += 1
      }
      val n = w.toFloat * h
      var j = 0
      while (j < bins) { hist(j) /= n; j += 1 }
      DecodedImage(w, h, hist)
    }

  /** Feature decode used by [[extractFeatures]]: real image decode when
    * the payload parses as one, real audio decode when it parses as
    * PCM audio, byte-histogram stub otherwise — one signature; fixture
    * text payloads, real PNGs, and real WAVs all flow through.
    */
  def decode(media: Array[Byte], bins: Int = 16): Array[Float] =
    decodeImage(media, bins).map(_.features)
      .orElse(decodeAudio(media, bins).map(_.features))
      .getOrElse(decodeStub(media, bins))

  /** STUB decode: a deterministic fake "pixel histogram" from the raw
    * bytes. Kept as the test double / fallback for non-image payloads;
    * real images take the [[decodeImage]] path.
    */
  def decodeStub(media: Array[Byte], bins: Int = 16): Array[Float] = {
    val hist = new Array[Float](bins)
    var i = 0
    while (i < media.length) {
      hist((media(i) & 0xFF) % bins) += 1f
      i += 1
    }
    if (media.length > 0) {
      var j = 0
      while (j < bins) { hist(j) /= media.length; j += 1 }
    }
    hist
  }

  /** Partition-parallel feature extraction over the typed Dataset; the
    * place where per-partition decoder init would live.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder context, model weights);
      // ImageIO's default disk-backed stream cache would write a temp
      // file per row — keep probing in-memory
      javax.imageio.ImageIO.setUseCache(false)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        digest.reset()
        val sum = digest.digest(r.media).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.kind, r.media.length.toLong, sum,
          decode(r.media))
      }
    }
  }

  /** End-to-end: documents → binary media → features, as a DataFrame. */
  def featurePipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(attachBinary(docs, "doc_id", "text").as[MediaRow]).toDF()
  }

  // --- resize -----------------------------------------------------------

  /** STUB resize: nearest-neighbor index mapping over the byte payload
    * as if it were a width×height single-channel image (the real
    * decoder's resize replaces the body; the signature — bytes +
    * dimensions in, bytes out — is the contract). Deterministic, so
    * tests can pin outputs.
    */
  def resizeStub(media: Array[Byte], width: Int, height: Int,
                 targetW: Int, targetH: Int): Array[Byte] = {
    val out = new Array[Byte](targetW * targetH)
    var i = 0
    while (i < targetH) {
      val srcRow = (i.toLong * height / targetH).toInt
      var j = 0
      while (j < targetW) {
        val srcCol = (j.toLong * width / targetW).toInt
        val idx = srcRow * width + srcCol
        out(i * targetW + j) =
          if (idx < media.length) media(idx) else 0: Byte
        j += 1
      }
      i += 1
    }
    out
  }

  /** REAL image resize for payloads that decode (pure JVM — the same
    * `javax.imageio` + `java.awt` stack as [[decodeImage]], no native
    * codecs): hardened decode → `Graphics2D` bilinear scale into an RGB
    * canvas → PNG re-encode. Returns None for opaque/corrupt payloads
    * and absurd targets, so [[resize]] can fall back to the byte stub —
    * the same real-first/stub-fallback split as `decode`/`decodeStub`.
    */
  def resizeImage(media: Array[Byte], targetW: Int,
                  targetH: Int): Option[Array[Byte]] =
    if (targetW <= 0 || targetH <= 0 ||
      targetW.toLong * targetH > MaxDecodePixels) None
    else readImage(media).flatMap { img =>
      try {
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        if (javax.imageio.ImageIO.write(out, "png", bos)) Some(bos.toByteArray)
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** Batch resize: a map over the typed Dataset updating payload and
    * metadata together — no shuffle, width/height stay truthful. Real
    * image payloads take the bilinear [[resizeImage]] path (output is a
    * true PNG at the target geometry); opaque payloads keep the
    * deterministic byte-stub semantics.
    */
  def resize(media: Dataset[MediaRow], targetW: Int,
             targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(
      media = resizeImage(r.media, targetW, targetH).getOrElse(
        resizeStub(r.media, r.width, r.height, targetW, targetH)),
      width = targetW, height = targetH))
  }

  // --- frame sampling ---------------------------------------------------

  /** One sampled frame of a video payload. */
  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_ts_ms: Long,
                            frame: Array[Byte])

  /** Frame sampling: video → one row PER SAMPLED FRAME — the
    * row-explosion shape (flatMap) that lets every downstream stage
    * (dedup, embedding, filtering) treat frames as first-class rows.
    * Frames stay in their source's partition (no shuffle); repartition
    * afterwards only if frame-level rebalancing is needed.
    *
    * STUB extraction: fixed-width byte windows with a constant
    * inter-frame interval stand in for decoded frames; the real decoder
    * replaces the window slicing, the fan-out plumbing is unchanged.
    */
  def sampleFrames(media: Dataset[MediaRow], frameIntervalMs: Long,
                   frameBytes: Int): Dataset[FrameRow] = {
    require(frameBytes > 0, "frameBytes must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeFrames(r.media) match {
        case Some(frames) =>
          sampleByInterval(frames, frameIntervalMs).iterator
            .map(f => FrameRow(r.doc_id, f.frame_idx, f.frame_ts_ms, f.png))
        case None =>
          val n = math.max(1, r.media.length / frameBytes)
          (0 until n).iterator.map { i =>
            FrameRow(r.doc_id, i, i * frameIntervalMs,
              java.util.Arrays.copyOfRange(r.media, i * frameBytes,
                math.min(r.media.length, (i + 1) * frameBytes)))
          }
      }
    }
  }

  /** One decoded animation frame: index, cumulative presentation time,
    * PNG re-encoding.
    */
  final case class DecodedFrame(frame_idx: Int, frame_ts_ms: Long,
                                png: Array[Byte])

  /** Frame-count ceiling for [[decodeFrames]]: an adversarial GIF
    * declaring millions of frames is truncated, not materialized.
    */
  val MaxDecodeFrames: Int = 4096

  /** REAL multi-frame decode for animation payloads the JVM can read
    * (animated GIF via `javax.imageio` — no native codecs): every frame
    * decodes to a PNG with its cumulative presentation timestamp from
    * the per-frame GIF delay metadata. Returns None for opaque payloads
    * and single-frame images (those aren't animations — [[decodeImage]]
    * is their path), so [[sampleFrames]] can fall back to the byte-stub
    * contract. Same hardening discipline as [[readImage]]: header-first
    * dimension guard per frame, frame-count cap, stream closed on every
    * path, all decoder throws contained.
    *
    * Frames are decoded as stored (no disposal-method compositing) —
    * the right trade for feature extraction, where per-frame content,
    * not faithful playback, is the product; real video (mp4/webm) needs
    * native codecs the sandbox lacks and stays on the stub path.
    */
  def decodeFrames(media: Array[Byte]): Option[Vector[DecodedFrame]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      if (iis == null) None
      else {
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              // seekForwardOnly=false: counting frames needs the search
              reader.setInput(iis, false, false)
              val n = math.min(reader.getNumImages(true), MaxDecodeFrames)
              if (n <= 1) None
              else {
                val out = Vector.newBuilder[DecodedFrame]
                var ts = 0L
                var i = 0
                var ok = true
                while (i < n && ok) {
                  val (w, h) = (reader.getWidth(i), reader.getHeight(i))
                  if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels)
                    ok = false
                  else {
                    val bos = new java.io.ByteArrayOutputStream()
                    ok = javax.imageio.ImageIO.write(reader.read(i), "png", bos)
                    if (ok) {
                      out += DecodedFrame(i, ts, bos.toByteArray)
                      ts += frameDelayMs(reader, i)
                    }
                  }
                  i += 1
                }
                if (ok) Some(out.result()) else None
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Per-frame presentation delay from the GIF GraphicControlExtension
    * (`delayTime`, 1/100 s units); 100 ms when absent/unparseable — the
    * common player default for unspecified delays.
    */
  private def frameDelayMs(reader: javax.imageio.ImageReader, i: Int): Long =
    try {
      val tree = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val gce = tree.getElementsByTagName("GraphicControlExtension")
      if (gce.getLength > 0)
        gce.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("delayTime").toLong * 10L
      else 100L
    } catch { case scala.util.control.NonFatal(_) => 100L }

  /** Greedy earliest-first interval sampling over the decoded timeline:
    * keep the first frame, then the next frame at least `intervalMs`
    * after the last kept one. interval 0 keeps everything.
    */
  private[graft] def sampleByInterval(frames: Seq[DecodedFrame],
                                      intervalMs: Long): Seq[DecodedFrame] = {
    var next = Long.MinValue
    frames.filter { f =>
      if (f.frame_ts_ms >= next) { next = f.frame_ts_ms + intervalMs; true }
      else false
    }
  }

  // --- perceptual image hashing ----------------------------------------

  /** 64-bit average hash (aHash): decode → bilinear 8×8 luminance grid
    * → bit i set iff cell i's luminance ≥ the grid mean. Survives
    * re-encoding, scaling, and small edits — the perceptual property
    * that makes it the image twin of MinHash for near-dup detection.
    * None for payloads that don't decode (they have no perceptual
    * content to hash).
    */
  def aHash(media: Array[Byte]): Option[Long] =
    readImage(media).flatMap { img =>
      try {
        val out = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 8, 8, null)
        } finally g.dispose()
        val lums = new Array[Int](64)
        var i = 0
        while (i < 64) {
          val rgb = out.getRGB(i % 8, i / 8)
          lums(i) = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
          i += 1
        }
        val mean = lums.sum / 64.0
        var h = 0L
        i = 0
        while (i < 64) { if (lums(i) >= mean) h |= 1L << i; i += 1 }
        Some(h)
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  final case class ImageHashRow(doc_id: Long, hash: Long)

  /** Map pass: one perceptual hash per decodable payload; opaque rows
    * drop (no hash ⇒ no perceptual dedup claim).
    */
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHashRow] = {
    import media.sparkSession.implicits._
    media.flatMap(r => aHash(r.media).map(ImageHashRow(r.doc_id, _)))
  }

  /** Near-duplicate image pairs by hamming distance over the 64-bit
    * perceptual hashes — banded exactly like MinHash-LSH: the hash
    * splits into `maxHamming+1` bands, and by pigeonhole two hashes
    * within `maxHamming` bits share at least one unchanged band, so
    * the band equi-join loses NO true pair (it is a lossless candidate
    * generator, unlike probabilistic LSH); `bit_count(xor)` then
    * verifies exactly. One shuffle on (band, key); never all-pairs.
    *
    * Hot-bucket guard (the [[graft.operators.Dedup]] LSH star
    * discipline): a real crawl's blank/solid-color images all hash to
    * the same degenerate aHash (`0x0`/`0xFFFF…`), identical in EVERY
    * band — one such class of n rows would emit n²/2 pairs on one join
    * task. A (band, key) bucket above `maxBucket` occupancy therefore
    * emits a spanning STAR rooted at the bucket's minimum doc_id
    * instead of all-pairs: n−1 edges, same connected components, so
    * downstream cluster/canonical consumers ([[graft.operators.DedupCluster]])
    * are unchanged for the degenerate identical-hash classes that
    * cause the blow-up. Star edges still pass the exact hamming
    * verify; in a MIXED over-cap bucket (a coincidental band
    * collision at extreme scale) far-from-hub members lose their
    * within-bucket pairs — recall loss confined to pathological
    * buckets, the same trade the text-LSH guard makes. The occupancy
    * agg is map-side combinable and the over-cap list is tiny by
    * definition (each entry represents > maxBucket rows), so both the
    * exclusion and the star join are broadcast-side. `maxBucket <= 0`
    * disables the guard.
    */
  def imageDupPairs(hashes: DataFrame, maxHamming: Int = 3,
                    maxBucket: Int = graft.operators.Dedup.DefaultMaxDf)
      : DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 16,
      s"maxHamming in [0,16] required, got $maxHamming")
    val bands = maxHamming + 1
    val width = 64 / bands
    val banded = hashes.select(col("doc_id"), col("hash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          // band b = bits [b*width, (b+1)*width) — the last band keeps
          // the remainder bits so all 64 participate
          (if (b == bands - 1) shiftrightunsigned(col("hash"), b * width)
           else shiftrightunsigned(col("hash"), b * width)
             .bitwiseAND(lit((1L << width) - 1))).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("hash"), col("bk.band"), col("bk.key"))
    def allPairs(rows: DataFrame): DataFrame = {
      val a = rows.select(col("band"), col("key"),
        col("doc_id").as("id_a"), col("hash").as("ha"))
      val b = rows.select(col("band"), col("key"),
        col("doc_id").as("id_b"), col("hash").as("hb"))
      a.join(b, Seq("band", "key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("ha"), col("hb"))
    }
    val candidates =
      if (maxBucket <= 0) allPairs(banded)
      else {
        val hot = banded.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("n"),
            min_by(struct(col("doc_id"), col("hash")), col("doc_id"))
              .as("hubrow"))
          .filter(col("n") > maxBucket)
          .select(col("band"), col("key"),
            col("hubrow.doc_id").as("hub"), col("hubrow.hash").as("hub_hash"))
        val cold = banded.join(broadcast(hot.select("band", "key")),
          Seq("band", "key"), "left_anti")
        // hub = bucket min id ⇒ (hub, member) already satisfies a < b
        val star = banded.join(broadcast(hot), Seq("band", "key"))
          .filter(col("doc_id") =!= col("hub"))
          .select(col("hub").as("id_a"), col("doc_id").as("id_b"),
            col("hub_hash").as("ha"), col("hash").as("hb"))
        allPairs(cold).unionByName(star)
      }
    candidates
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- audio ------------------------------------------------------------

  /** A really-decoded audio payload: true stream geometry + signal
    * statistics + a normalized amplitude histogram (the audio analogue
    * of [[DecodedImage]]'s luminance histogram).
    */
  final case class DecodedAudio(sample_rate: Float, channels: Int,
                                n_frames: Long, duration_ms: Long,
                                rms: Float, zero_cross_rate: Float,
                                features: Array[Float])

  /** Sample-count ceiling for [[decodeAudio]]: header-declared
    * frames×channels above this (≈128 MB of 16-bit PCM) are rejected
    * before the sample buffer is read.
    */
  val MaxDecodeSamples: Long = 64L * 1024 * 1024

  /** REAL pure-JVM audio decode for formats `javax.sound.sampled` reads
    * without native codecs (PCM WAV/AIFF/AU, any bit depth the JDK
    * converts): bytes → stream geometry + RMS energy + zero-crossing
    * rate + a `bins`-bucket amplitude histogram. The input is
    * normalized to signed 16-bit PCM first so 8-bit/unsigned variants
    * share one sample loop. Returns None for non-audio payloads —
    * [[decode]] falls through to the image decoder and then the byte
    * stub, one signature across modalities.
    *
    * Hardening mirrors [[readImage]]: the frame count comes from the
    * HEADER (read before any sample data) and is checked against
    * [[MaxDecodeSamples]]; all decoder throws are contained.
    */
  /** One analysis window of an audio payload: index, start time,
    * per-window RMS energy and zero-crossing rate.
    */
  final case class AudioWindowRow(doc_id: Long, window_idx: Int,
                                  window_ts_ms: Long, rms: Float,
                                  zero_cross_rate: Float)

  /** Windowed audio features — the audio twin of [[sampleFrames]]'s
    * row explosion: decode once, then one row per `windowMs` window
    * with its own RMS/ZCR, so downstream stages (silence trimming,
    * segment dedup, energy filtering) treat windows as first-class
    * rows. Real for the PCM formats [[decodeAudio]] reads; payloads
    * that don't decode contribute no rows (no fake windows — the
    * honest analogue of [[imageHashes]] dropping opaque rows). Pure
    * flatMap: windows stay in their source row's partition.
    */
  def sampleAudioWindows(media: Dataset[MediaRow],
                         windowMs: Long): Dataset[AudioWindowRow] = {
    require(windowMs > 0, "windowMs must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      decodeAudioSamples(r.media) match {
        case None => Iterator.empty
        case Some((rate, channels, samples)) =>
          val perWindow = math.max(1,
            (rate * windowMs / 1000).toInt) * channels
          val n = samples.length
          (0 until (n + perWindow - 1) / perWindow).iterator.map { wi =>
            val from = wi * perWindow
            val until = math.min(n, from + perWindow)
            var sumSq = 0.0
            var crossings = 0L
            var frames = 0L
            var prevSign = 0
            var i = from
            while (i < until) {
              val s = samples(i)
              sumSq += s.toDouble * s
              if ((i - from) % channels == 0) {
                frames += 1
                val sign = Integer.signum(s)
                if (sign != 0) {
                  if (prevSign != 0 && sign != prevSign) crossings += 1
                  prevSign = sign
                }
              }
              i += 1
            }
            AudioWindowRow(r.doc_id, wi, wi * windowMs,
              (math.sqrt(sumSq / (until - from)) / 32768.0).toFloat,
              if (frames > 1) crossings.toFloat / (frames - 1) else 0f)
          }
      }
    }
  }

  /** Shared hardened decode-to-PCM16: (sampleRate, channels, samples)
    * with the header-first [[MaxDecodeSamples]] guard; None for
    * non-audio payloads. Backs [[decodeAudio]] and
    * [[sampleAudioWindows]].
    */
  private def decodeAudioSamples(
      media: Array[Byte]): Option[(Float, Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(media))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val channels = fmt.getChannels
        if (frames <= 0 || channels <= 0 || fmt.getSampleRate <= 0 ||
          frames * channels > MaxDecodeSamples) None
        else {
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, channels, 2 * channels,
            fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, ais)
          try {
            val bytes = pcm.readAllBytes()
            val n = bytes.length / 2
            if (n == 0) None
            else {
              val samples = new Array[Short](n)
              var i = 0
              while (i < n) {
                samples(i) =
                  ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort
                i += 1
              }
              Some((fmt.getSampleRate, channels, samples))
            }
          } finally pcm.close()
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  def decodeAudio(media: Array[Byte], bins: Int = 16): Option[DecodedAudio] =
    decodeAudioSamples(media).map { case (rate, channels, samples) =>
      val n = samples.length
      val hist = new Array[Float](bins)
      var sumSq = 0.0
      var crossings = 0L
      var prevSign = 0
      var i = 0
      while (i < n) {
        val s = samples(i)
        val a = math.abs(s.toInt)
        hist(math.min(bins - 1, a * bins / 32768)) += 1f
        sumSq += s.toDouble * s
        // zero-crossing over channel 0 only
        if (i % channels == 0) {
          val sign = Integer.signum(s)
          if (sign != 0) {
            if (prevSign != 0 && sign != prevSign) crossings += 1
            prevSign = sign
          }
        }
        i += 1
      }
      var j = 0
      while (j < bins) { hist(j) /= n; j += 1 }
      val nFrames = n / channels
      DecodedAudio(rate, channels, nFrames.toLong,
        math.round(nFrames * 1000.0 / rate),
        (math.sqrt(sumSq / n) / 32768.0).toFloat,
        if (nFrames > 1) crossings.toFloat / (nFrames - 1) else 0f,
        hist)
    }
}
