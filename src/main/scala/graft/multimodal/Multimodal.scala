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
    * the payload parses as one, byte-histogram stub otherwise — one
    * signature, both fixture text payloads and real PNGs flow through.
    */
  def decode(media: Array[Byte], bins: Int = 16): Array[Float] =
    decodeImage(media, bins).map(_.features).getOrElse(decodeStub(media, bins))

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
      val n = math.max(1, r.media.length / frameBytes)
      (0 until n).iterator.map { i =>
        FrameRow(r.doc_id, i, i * frameIntervalMs,
          java.util.Arrays.copyOfRange(r.media, i * frameBytes,
            math.min(r.media.length, (i + 1) * frameBytes)))
      }
    }
  }
}
