package graft.multimodal

import java.io.ByteArrayOutputStream

/** WebM / Matroska CONTAINER metadata via a real EBML walk (public
  * Matroska spec): `EBML(DocType)` then
  * `Segment(Info{TimecodeScale, Duration}, Tracks(TrackEntry{TrackType,
  * CodecID, Video{PixelWidth, PixelHeight}}))` — the second container
  * family a video corpus carries ([[Mp4]] covers ISO BMFF). Frame
  * payloads (Clusters) are out of the metadata contract, exactly like
  * Mp4's missing mdat: geometry/codec/duration are what the pipeline
  * schema needs. Hardened the same way: bounds-checked VINTs,
  * element-count and depth caps, unknown-size elements only honored
  * where the spec allows them (Segment), everything else loud-None.
  *
  * [[build]] synthesizes a structurally complete metadata-only WebM so
  * parser and builder check each other against the spec independently
  * (the Mp4 convention).
  */
object Webm {

  /** Container-level metadata of the (first) video track. */
  final case class WebmMeta(docType: String, codec: String, width: Int,
                            height: Int, duration_ms: Long)

  val MaxElements: Int = 100000
  val MaxDepth: Int = 16

  // EBML / Matroska element IDs (marker bit kept, per convention)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimecodeScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL

  private final class Walk { var n = 0 }

  /** Parse container metadata; None for anything that is not
    * well-formed EBML with a video track.
    */
  def parseMeta(bytes: Array[Byte]): Option[WebmMeta] =
    try {
      val w = new Walk
      var docType: Option[String] = None
      var timecodeScale = 1000000L // spec default: ns per timecode unit
      var durationTc: Option[Double] = None
      var video: Option[(String, Int, Int)] = None

      foreachElement(bytes, 0, bytes.length, 0, w) { (id, s, e) =>
        if (id == IdEbml)
          foreachElement(bytes, s, e, 1, w) { (id2, s2, e2) =>
            if (id2 == IdDocType) docType = Some(str(bytes, s2, e2))
          }
        else if (id == IdSegment)
          foreachElement(bytes, s, e, 1, w) { (id2, s2, e2) =>
            if (id2 == IdInfo)
              foreachElement(bytes, s2, e2, 2, w) { (id3, s3, e3) =>
                if (id3 == IdTimecodeScale) timecodeScale = uint(bytes, s3, e3)
                else if (id3 == IdDuration) durationTc = Some(fl(bytes, s3, e3))
              }
            else if (id2 == IdTracks && video.isEmpty)
              foreachElement(bytes, s2, e2, 2, w) { (id3, s3, e3) =>
                if (id3 == IdTrackEntry && video.isEmpty)
                  video = parseTrackEntry(bytes, s3, e3, w)
              }
          }
      }
      for {
        d <- docType
        (codec, vw, vh) <- video
        dur <- durationTc
      } yield WebmMeta(d, codec, vw, vh,
        // duration is in timecode units; scale is ns per unit
        math.round(dur * timecodeScale / 1e6))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseTrackEntry(b: Array[Byte], s: Int, e: Int,
                              w: Walk): Option[(String, Int, Int)] = {
    var isVideo = false
    var codec = "?"
    var wh: Option[(Int, Int)] = None
    foreachElement(b, s, e, 3, w) { (id, s1, e1) =>
      if (id == IdTrackType) isVideo = uint(b, s1, e1) == 1L
      else if (id == IdCodecId) codec = str(b, s1, e1)
      else if (id == IdVideo) {
        var pw = 0; var ph = 0
        foreachElement(b, s1, e1, 4, w) { (id2, s2, e2) =>
          if (id2 == IdPixelWidth) pw = uint(b, s2, e2).toInt
          else if (id2 == IdPixelHeight) ph = uint(b, s2, e2).toInt
        }
        if (pw > 0 && ph > 0) wh = Some((pw, ph))
      }
    }
    if (isVideo) wh.map { case (pw, ph) => (codec, pw, ph) } else None
  }

  /** Walk child elements of [start, end): VINT id (marker kept) +
    * VINT size (marker stripped) + payload. An all-ones size VINT
    * means "unknown size" — honored only for Segment (runs to parent
    * end, as streamed files write it); elsewhere it's malformed.
    */
  private def foreachElement(b: Array[Byte], start: Int, end: Int,
                             depth: Int, w: Walk)(
      f: (Long, Int, Int) => Unit): Unit = {
    require(depth <= MaxDepth, "EBML nesting too deep")
    var p = start
    while (p < end) {
      w.n += 1
      require(w.n <= MaxElements, "too many EBML elements")
      val (id, p1) = readVint(b, p, end, keepMarker = true)
      val idLen = p1 - p
      require(idLen >= 1 && idLen <= 4, s"bad EBML id length $idLen")
      val (size, p2) = readVint(b, p1, end, keepMarker = false)
      val unknownSize = size == unknownOf(p2 - p1)
      val payloadEnd =
        if (unknownSize) {
          require(id == IdSegment, "unknown-size element outside Segment")
          end
        } else {
          require(size >= 0 && p2 + size <= end,
            s"element 0x${id.toHexString} overruns parent")
          p2 + size.toInt
        }
      f(id, p2, payloadEnd)
      p = payloadEnd
    }
  }

  /** Max value encodable in an n-byte size VINT = the unknown marker. */
  private def unknownOf(n: Int): Long = (1L << (7 * n)) - 1

  /** EBML VINT: leading-zero count of the first byte gives the width. */
  private def readVint(b: Array[Byte], p: Int, end: Int,
                       keepMarker: Boolean): (Long, Int) = {
    require(p < end, "truncated VINT")
    val first = b(p) & 0xff
    require(first != 0, "VINT with >8-byte width")
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 32-8-1
    require(p + len <= end, "truncated VINT body")
    var v: Long = if (keepMarker) first.toLong
      else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v, p + len)
  }

  private def uint(b: Array[Byte], s: Int, e: Int): Long = {
    require(e - s >= 1 && e - s <= 8, s"bad uint width ${e - s}")
    var v = 0L; var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def fl(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, s, e))
    case n => throw new IllegalArgumentException(s"bad float width $n")
  }

  private def str(b: Array[Byte], s: Int, e: Int): String =
    new String(b, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
      .takeWhile(_ != '\u0000')

  // --- build (fixture synthesizer) --------------------------------------

  /** A structurally complete metadata-only WebM: EBML header (DocType)
    * + Segment(Info, Tracks(video TrackEntry)). TimecodeScale is the
    * 1 ms convention (1 000 000 ns) so Duration units are milliseconds.
    */
  def build(width: Int, height: Int, durationMs: Long,
            codec: String = "V_VP9", docType: String = "webm"): Array[Byte] = {
    require(width > 0 && height > 0, s"geometry out of range: ${width}x$height")
    require(durationMs >= 0, "negative duration")

    def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      val out = new ByteArrayOutputStream(body.length + 12)
      writeId(out, id); writeSize(out, body.length.toLong); out.write(body)
      out.toByteArray
    }
    def uintEl(id: Long, v: Long): Array[Byte] = el(id, uintBytes(v))
    def strEl(id: Long, s: String): Array[Byte] = el(id, s.getBytes("UTF-8"))

    val ebml = el(IdEbml,
      uintEl(0x4286L, 1), // EBMLVersion
      uintEl(0x42F7L, 1), // EBMLReadVersion
      uintEl(0x42F2L, 4), // EBMLMaxIDLength
      uintEl(0x42F3L, 8), // EBMLMaxSizeLength
      strEl(IdDocType, docType),
      uintEl(0x4287L, 2), // DocTypeVersion
      uintEl(0x4285L, 2)) // DocTypeReadVersion
    val info = el(IdInfo,
      uintEl(IdTimecodeScale, 1000000L),
      el(IdDuration, floatBytes(durationMs.toDouble)))
    val video = el(IdVideo,
      uintEl(IdPixelWidth, width.toLong), uintEl(IdPixelHeight, height.toLong))
    val trackEntry = el(IdTrackEntry,
      uintEl(0xD7L, 1),   // TrackNumber
      uintEl(0x73C5L, 1), // TrackUID
      uintEl(IdTrackType, 1),
      strEl(IdCodecId, codec),
      video)
    val segment = el(IdSegment, info, el(IdTracks, trackEntry))
    Array.concat(ebml, segment)
  }

  private def uintBytes(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (1 to n).map(i => ((v >>> (8 * (n - i))) & 0xffL).toByte).toArray
  }
  private def floatBytes(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (1 to 8).map(i => ((bits >>> (8 * (8 - i))) & 0xffL).toByte).toArray
  }
  /** Element ids are stored as-declared (marker kept). */
  private def writeId(out: ByteArrayOutputStream, id: Long): Unit = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8)
    (1 to n).foreach(i => out.write(((id >>> (8 * (n - i))) & 0xffL).toInt))
  }
  /** Sizes get the standard shortest-form VINT with marker bit. */
  private def writeSize(out: ByteArrayOutputStream, v: Long): Unit = {
    var n = 1
    while (n < 8 && v >= unknownOf(n)) n += 1 // avoid the all-ones marker
    val marked = v | (1L << (7 * n))
    (1 to n).foreach(i => out.write(((marked >>> (8 * (n - i))) & 0xffL).toInt))
  }
}
