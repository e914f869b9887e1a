package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Mp4

/** MP4 container metadata: the box walk against byte-real ISO BMFF
  * structure, both versions of the time headers, the adversarial-input
  * caps, and the loud-None contract for non-MP4 payloads.
  */
class Mp4Spec extends AnyFunSuite {

  test("roundtrip: geometry, codec, brand, frame count and duration " +
      "survive build → parse (version-0 headers)") {
    val bytes = Mp4.build(640, 360, frameCount = 24, frameDeltaMs = 40)
    val m = Mp4.parseMeta(bytes).get
    assert(m == Mp4.VideoMeta("isom", "avc1", 640, 360, 24L, 960L))
  }

  test("version-1 mvhd/tkhd (64-bit times) parse identically") {
    val v0 = Mp4.parseMeta(Mp4.build(320, 240, 10, 100)).get
    val v1 = Mp4.parseMeta(Mp4.build(320, 240, 10, 100, v1 = true)).get
    assert(v0 == v1)
    assert(v1.duration_ms == 1000L)
  }

  test("alternate codec fourcc and brand are reported as-is") {
    val m = Mp4.parseMeta(Mp4.build(64, 64, 1, 33, codec = "hvc1",
      brand = "mp42")).get
    assert(m.codec == "hvc1" && m.brand == "mp42")
  }

  test("extreme geometry bounds: 1x1 and 65535x65535 survive; zero " +
      "frames give zero duration") {
    assert(Mp4.parseMeta(Mp4.build(1, 1, 0, 40)).get ==
      Mp4.VideoMeta("isom", "avc1", 1, 1, 0L, 0L))
    val m = Mp4.parseMeta(Mp4.build(0xffff, 0xffff, 3, 1)).get
    assert(m.width == 0xffff && m.height == 0xffff && m.n_frames == 3L)
  }

  test("non-MP4 payloads are None, never a throw: garbage, empty, " +
      "truncated container, text bytes") {
    assert(Mp4.parseMeta(Array.empty[Byte]).isEmpty)
    assert(Mp4.parseMeta("not a video at all".getBytes).isEmpty)
    assert(Mp4.parseMeta(Array.fill(1024)(0x41.toByte)).isEmpty)
    val good = Mp4.build(64, 64, 5, 40)
    assert(Mp4.parseMeta(good.take(good.length / 2)).isEmpty ||
      Mp4.parseMeta(good.take(good.length / 2)).isEmpty) // moov cut off
    // a valid-looking file whose moov is truncated mid-box
    assert(Mp4.parseMeta(good.dropRight(7)).isEmpty)
  }

  test("adversarial caps: a crafted stream of tiny boxes stops at " +
      "MaxBoxes instead of walking forever") {
    // 8-byte 'free' boxes back to back — structurally valid, millions
    // of them would DoS an uncapped walker
    val n = Mp4.MaxBoxes + 10
    val bytes = new Array[Byte](n * 8)
    var i = 0
    while (i < n) {
      bytes(i * 8 + 3) = 8
      bytes(i * 8 + 4) = 'f'; bytes(i * 8 + 5) = 'r'
      bytes(i * 8 + 6) = 'e'; bytes(i * 8 + 7) = 'e'
      i += 1
    }
    assert(Mp4.parseMeta(bytes).isEmpty) // contained, no hang / throw
  }

  test("an audio-only container (hdlr 'soun') yields no video meta") {
    // rewrite the handler fourcc in a built file: structure stays valid
    val bytes = Mp4.build(64, 64, 5, 40)
    val idx = indexOfSlice(bytes, "vide".getBytes)
    assert(idx > 0)
    System.arraycopy("soun".getBytes, 0, bytes, idx, 4)
    assert(Mp4.parseMeta(bytes).isEmpty)
  }

  test("builder rejects out-of-range geometry and fourcc loudly") {
    intercept[IllegalArgumentException] { Mp4.build(0, 64, 1, 1) }
    intercept[IllegalArgumentException] { Mp4.build(64, 0x10000, 1, 1) }
    intercept[IllegalArgumentException] { Mp4.build(64, 64, 1, 1, codec = "toolong") }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int =
    hay.indices.find(i => i + needle.length <= hay.length &&
      needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)
}
