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
}
