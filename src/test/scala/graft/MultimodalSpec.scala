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
}
