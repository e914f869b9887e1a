package graft.multimodal

import java.io.ByteArrayOutputStream

/** MP4 (ISO BMFF, ISO/IEC 14496-12) CONTAINER metadata: true
  * geometry / duration / frame count parsed from the box structure —
  * `ftyp` → `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd,
  * stts)))))` — replacing the fabricated fields of the byte-stub video
  * path ([[Multimodal.sampleFrames]]'s fallback). Full-codec frame
  * decode stays out of scope (native codecs); the container walk is
  * real and hardened for untrusted corpora: every box is
  * bounds-checked against its parent, 64-bit largesize boxes are
  * handled, and box-count / depth caps stop adversarial recursion
  * before it allocates anything.
  *
  * [[build]] is the inverse — a minimal-but-structurally-complete
  * moov-only MP4 synthesizer (the fixture corpus has no real media) so
  * the parser is exercised against byte-real container structure, with
  * the two directions written against the spec independently.
  */
object Mp4 {

  /** Container-level metadata of the (first) video track. */
  final case class VideoMeta(brand: String, codec: String, width: Int,
                             height: Int, n_frames: Long, duration_ms: Long)

  /** Adversarial-input caps: a crafted file declaring millions of tiny
    * boxes (or pathological nesting) is rejected, not walked.
    */
  val MaxBoxes: Int = 100000
  val MaxDepth: Int = 16

  // --- parse -----------------------------------------------------------

  private final class Walk { var boxes = 0 }

  /** Parse container metadata; None for anything that is not a
    * well-formed MP4 with a video track (the callers' byte-stub
    * fallback contract, same shape as
    * [[Multimodal.decodeFrames]]).
    */
  def parseMeta(bytes: Array[Byte]): Option[VideoMeta] =
    try {
      val w = new Walk
      var brand: Option[String] = None
      var mvhd: Option[(Long, Long)] = None // (timescale, duration)
      var video: Option[(String, Int, Int, Long)] = None // codec,w,h,frames

      foreachBox(bytes, 0L, bytes.length.toLong, 0, w) { (typ, s, e) =>
        typ match {
          case "ftyp" if e - s >= 4 =>
            brand = Some(fourcc(bytes, s))
          case "moov" =>
            foreachBox(bytes, s, e, 1, w) { (t2, s2, e2) =>
              t2 match {
                case "mvhd" => mvhd = parseMvhd(bytes, s2, e2)
                case "trak" if video.isEmpty =>
                  video = parseTrak(bytes, s2, e2, w)
                case _ =>
              }
            }
          case _ =>
        }
      }
      for {
        b <- brand
        (codec, vw, vh, frames) <- video
        (timescale, duration) <- mvhd
        if timescale > 0
      } yield VideoMeta(b, codec, vw, vh, frames,
        duration * 1000L / timescale)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Walk the child boxes of [start, end), applying `f(type, payloadStart,
    * payloadEnd)`. Malformed sizes / caps exceeded throw (contained by
    * parseMeta's catch).
    */
  private def foreachBox(b: Array[Byte], start: Long, end: Long, depth: Int,
                         w: Walk)(f: (String, Long, Long) => Unit): Unit = {
    require(depth <= MaxDepth, "box nesting too deep")
    var p = start
    while (p + 8 <= end) {
      w.boxes += 1
      require(w.boxes <= MaxBoxes, "too many boxes")
      val size32 = u32(b, p)
      val typ = fourcc(b, p + 4)
      val (payload, boxEnd) =
        if (size32 == 1L) { // 64-bit largesize follows the type
          require(p + 16 <= end, "truncated largesize box")
          val size64 = u64(b, p + 8)
          require(size64 >= 16 && p + size64 <= end, s"bad largesize $size64")
          (p + 16, p + size64)
        } else if (size32 == 0L) (p + 8, end) // box extends to parent end
        else {
          require(size32 >= 8 && p + size32 <= end, s"bad box size $size32")
          (p + 8, p + size32)
        }
      f(typ, payload, boxEnd)
      p = boxEnd
    }
  }

  /** mvhd → (timescale, duration); handles version 0 (u32 times) and
    * version 1 (u64 times).
    */
  private def parseMvhd(b: Array[Byte], s: Long, e: Long): Option[(Long, Long)] = {
    if (e - s < 4) return None
    b(s.toInt) match {
      case 0 if e - s >= 20 => Some((u32(b, s + 12), u32(b, s + 16)))
      case 1 if e - s >= 32 => Some((u32(b, s + 20), u64(b, s + 24)))
      case _ => None
    }
  }

  /** trak → (codec, width, height, frame count) if it is a video track
    * (`hdlr` handler_type == 'vide'), preferring the stsd sample
    * entry's coded size over tkhd's 16.16 presentation size.
    */
  private def parseTrak(b: Array[Byte], s: Long, e: Long,
                        w: Walk): Option[(String, Int, Int, Long)] = {
    var isVideo = false
    var tkhdWh: Option[(Int, Int)] = None
    var stsdMeta: Option[(String, Int, Int)] = None
    var frames = 0L
    foreachBox(b, s, e, 2, w) { (t, s1, e1) =>
      t match {
        case "tkhd" => tkhdWh = parseTkhd(b, s1, e1)
        case "mdia" =>
          foreachBox(b, s1, e1, 3, w) { (t2, s2, e2) =>
            t2 match {
              case "hdlr" if e2 - s2 >= 12 =>
                isVideo = fourcc(b, s2 + 8) == "vide"
              case "minf" =>
                foreachBox(b, s2, e2, 4, w) { (t3, s3, e3) =>
                  if (t3 == "stbl")
                    foreachBox(b, s3, e3, 5, w) { (t4, s4, e4) =>
                      t4 match {
                        case "stsd" => stsdMeta = parseStsd(b, s4, e4)
                        case "stts" => frames = parseSttsFrames(b, s4, e4)
                        case _ =>
                      }
                    }
                }
              case _ =>
            }
          }
        case _ =>
      }
    }
    if (!isVideo) None
    else {
      val codec = stsdMeta.map(_._1).getOrElse("????")
      val (vw, vh) = stsdMeta.map(m => (m._2, m._3))
        .orElse(tkhdWh).getOrElse((0, 0))
      Some((codec, vw, vh, frames))
    }
  }

  /** tkhd presentation size: 16.16 fixed point at the end of the box
    * (offset 76 for version 0, 88 for version 1).
    */
  private def parseTkhd(b: Array[Byte], s: Long, e: Long): Option[(Int, Int)] = {
    if (e - s < 4) return None
    val off = b(s.toInt) match {
      case 0 => 76L
      case 1 => 88L
      case _ => return None
    }
    if (e - s < off + 8) None
    else Some(((u32(b, s + off) >> 16).toInt, (u32(b, s + off + 4) >> 16).toInt))
  }

  /** stsd first sample entry: fourcc codec + coded width/height (u16 at
    * entry offsets 32/34 for visual sample entries).
    */
  private def parseStsd(b: Array[Byte], s: Long, e: Long): Option[(String, Int, Int)] = {
    if (e - s < 8 || u32(b, s + 4) < 1) return None
    val entry = s + 8
    if (e - entry < 36) return None
    val size = u32(b, entry)
    if (size < 36 || entry + size > e) return None
    Some((fourcc(b, entry + 4), u16(b, entry + 32), u16(b, entry + 34)))
  }

  /** stts: Σ sample_count over the (count, delta) run-length table. */
  private def parseSttsFrames(b: Array[Byte], s: Long, e: Long): Long = {
    if (e - s < 8) return 0L
    val n = u32(b, s + 4)
    var total = 0L
    var i = 0L
    while (i < n && s + 8 + i * 8 + 8 <= e) {
      total += u32(b, s + 8 + i * 8)
      i += 1
    }
    total
  }

  private def u16(b: Array[Byte], p: Long): Int = {
    val i = p.toInt
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  }
  private def u32(b: Array[Byte], p: Long): Long = {
    val i = p.toInt
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], p: Long): Long =
    (u32(b, p) << 32) | u32(b, p + 4)
  private def fourcc(b: Array[Byte], p: Long): String =
    new String(b, p.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // --- build (fixture synthesizer) --------------------------------------

  /** A structurally complete metadata-only MP4 (`ftyp` + `moov` with one
    * video trak: tkhd/mdhd/hdlr/vmhd/dinf/stbl{stsd,stts,stsc,stsz,stco};
    * no mdat — the payload is out of the metadata contract). Movie
    * timescale is 1000 so duration units are milliseconds. `v1` emits
    * version-1 mvhd/tkhd (64-bit times) to exercise both parser paths.
    */
  def build(width: Int, height: Int, frameCount: Long, frameDeltaMs: Long,
            codec: String = "avc1", brand: String = "isom",
            v1: Boolean = false): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"geometry out of range: ${width}x$height")
    require(frameCount >= 0 && frameDeltaMs >= 0, "negative timing")
    require(codec.length == 4 && brand.length == 4, "fourcc must be 4 chars")
    val durationMs = frameCount * frameDeltaMs

    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      val out = new ByteArrayOutputStream(body.length + 8)
      wr32(out, body.length + 8L); out.write(typ.getBytes("US-ASCII"))
      out.write(body); out.toByteArray
    }

    val ftyp = box("ftyp", brand.getBytes("US-ASCII"), be32(0x200),
      brand.getBytes("US-ASCII"), "mp41".getBytes("US-ASCII"))

    val mvhd =
      if (!v1) box("mvhd", be32(0), be32(0), be32(0), be32(1000),
        be32(durationMs), be32(0x00010000), Array[Byte](1, 0), new Array[Byte](10),
        identityMatrix, new Array[Byte](24), be32(2))
      else box("mvhd", Array[Byte](1, 0, 0, 0), be64(0), be64(0), be32(1000),
        be64(durationMs), be32(0x00010000), Array[Byte](1, 0), new Array[Byte](10),
        identityMatrix, new Array[Byte](24), be32(2))

    val tkhd =
      if (!v1) box("tkhd", be32(7), be32(0), be32(0), be32(1), be32(0),
        be32(durationMs), new Array[Byte](8), new Array[Byte](8),
        identityMatrix, be32(width << 16), be32(height << 16))
      else box("tkhd", Array[Byte](1, 0, 0, 7), be64(0), be64(0), be32(1),
        be32(0), be64(durationMs), new Array[Byte](8), new Array[Byte](8),
        identityMatrix, be32(width << 16), be32(height << 16))

    // language 'und' packed ISO-639-2: (21<<10)|(14<<5)|4 = 0x55C4
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(durationMs), be16(0x55c4), be16(0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes("US-ASCII"),
      new Array[Byte](12), "graft video handler ".getBytes("US-ASCII"))
    val vmhd = box("vmhd", be32(1), new Array[Byte](8))
    val dref = box("dref", be32(0), be32(1), box("url ", be32(1)))
    val dinf = box("dinf", dref)

    // visual sample entry: 6 reserved + u16 dri, 16 pre_defined/reserved,
    // u16 width/height, 16.16 dpi x2, u32 reserved, u16 frame_count,
    // 32-byte compressorname, u16 depth, i16 pre_defined(-1)
    val sampleEntry = {
      val body = Array.concat(new Array[Byte](6), be16(1),
        new Array[Byte](16), be16(width), be16(height),
        be32(0x00480000), be32(0x00480000), be32(0), be16(1),
        new Array[Byte](32), be16(24), be16(0xffff))
      val out = new ByteArrayOutputStream()
      wr32(out, body.length + 8L); out.write(codec.getBytes("US-ASCII"))
      out.write(body); out.toByteArray
    }
    val stsd = box("stsd", be32(0), be32(1), sampleEntry)
    val stts = box("stts", be32(0), be32(1), be32(frameCount),
      be32(frameDeltaMs))
    val stsc = box("stsc", be32(0), be32(0))
    val stsz = box("stsz", be32(0), be32(0), be32(frameCount))
    val stco = box("stco", be32(0), be32(0))

    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    Array.concat(ftyp, moov)
  }

  private val identityMatrix: Array[Byte] =
    Array.concat(be32(0x00010000), be32(0), be32(0), be32(0),
      be32(0x00010000), be32(0), be32(0), be32(0), be32(0x40000000))

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] =
    Array.concat(be32(v >>> 32), be32(v & 0xffffffffL))
  private def wr32(out: ByteArrayOutputStream, v: Long): Unit =
    out.write(be32(v), 0, 4)
}
