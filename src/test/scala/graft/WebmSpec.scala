package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Webm

/** WebM/Matroska container metadata: the EBML walk against byte-real
  * structure, VINT widths, the unknown-size rule, adversarial caps,
  * and the loud-None contract.
  */
class WebmSpec extends AnyFunSuite {

  test("roundtrip: geometry, codec, docType and ms duration survive " +
      "build → parse") {
    val m = Webm.parseMeta(Webm.build(1280, 720, durationMs = 4250)).get
    assert(m == Webm.WebmMeta("webm", "V_VP9", 1280, 720, 4250L))
  }

  test("alternate codec/docType and VINT-width edges (1x1, 65535-wide, " +
      "0 duration, >1-byte sizes) survive") {
    assert(Webm.parseMeta(Webm.build(1, 1, 0)).get ==
      Webm.WebmMeta("webm", "V_VP9", 1, 1, 0L))
    val m = Webm.parseMeta(Webm.build(65535, 4320, 86400000L,
      codec = "V_AV1", docType = "matroska")).get
    assert(m.codec == "V_AV1" && m.docType == "matroska" &&
      m.width == 65535 && m.duration_ms == 86400000L)
  }

  test("an unknown-size Segment (streamed-file shape) parses to " +
      "parent end") {
    val bytes = Webm.build(320, 240, 1000)
    // locate the Segment id (0x18538067) and rewrite its size VINT
    // with the 1-byte unknown marker 0xFF (spec: size unknown)
    val segIdx = indexOfSlice(bytes,
      Array(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    assert(segIdx > 0)
    val sizeStart = segIdx + 4
    // existing size VINT width from its first byte
    val first = bytes(sizeStart) & 0xff
    val width = Integer.numberOfLeadingZeros(first) - 23
    val patched = bytes.take(sizeStart) ++ Array(0xff.toByte) ++
      bytes.drop(sizeStart + width)
    assert(Webm.parseMeta(patched).get ==
      Webm.parseMeta(bytes).get)
  }

  test("non-EBML payloads are None, never a throw: garbage, empty, " +
      "truncated, audio-only track") {
    assert(Webm.parseMeta(Array.empty[Byte]).isEmpty)
    assert(Webm.parseMeta("just some text".getBytes).isEmpty)
    val good = Webm.build(64, 64, 500)
    assert(Webm.parseMeta(good.dropRight(5)).isEmpty)
    // flip TrackType (0x83, value 1=video) to 2 (audio)
    val idx = indexOfSlice(good, Array(0x83.toByte, 0x81.toByte, 1.toByte))
    assert(idx > 0)
    good(idx + 2) = 2
    assert(Webm.parseMeta(good).isEmpty)
  }

  test("adversarial caps: a stream of tiny void elements stops at " +
      "MaxElements instead of walking forever") {
    val n = Webm.MaxElements + 10
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) { // 0xEC = Void id, 0x80 = zero-length size
      bytes(i * 2) = 0xec.toByte; bytes(i * 2 + 1) = 0x80.toByte
      i += 1
    }
    assert(Webm.parseMeta(bytes).isEmpty)
  }

  test("builder rejects bad geometry loudly") {
    intercept[IllegalArgumentException] { Webm.build(0, 64, 1) }
    intercept[IllegalArgumentException] { Webm.build(64, -1, 1) }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int =
    hay.indices.find(i => i + needle.length <= hay.length &&
      needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
}
