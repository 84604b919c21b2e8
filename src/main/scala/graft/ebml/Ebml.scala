package graft.ebml

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** EBML (Matroska) parsing and writing over in-memory byte arrays.
  *
  * Re-expresses the reference's non-seekable stream parser
  * (/root/reference/ebml.py:152-349) for Spark's execution model: instead
  * of one thread walking one endless socket, each row carries a fragment
  * blob (`binary` column) and a codegen-adjacent JVM kernel parses it —
  * embarrassingly parallel across 100 TB of fragments.
  *
  * Semantics covered from the reference:
  *  - varint element IDs, 1-4 bytes (ebml.py:185-197)
  *  - varint sizes, 1-8 bytes, unknown-size sentinel → -1 (ebml.py:199-247)
  *  - typed payloads SINT/UINT/FLOAT/STRING/UTF8/DATE/MASTER/BINARY
  *    (ebml.py:307-349), DATE = ns since 2001-01-01 (ebml.py:339-342)
  *  - id→(name,type) table, Matroska subset (ebml.py:14-122)
  *  - absolute-position tracking (ebml.py:164,175-183) — the key the
  *    reference uses to associate tags with packets (parser.py:421-432)
  *  - TagName/TagString pair extraction (parser.py:352-366)
  *
  * The writer is the inverse (the reference has none — it is what lets us
  * test the parser hermetically and carry multimodal payloads). It emits
  * sizes as fixed 8-byte varints, which is valid EBML and keeps fragment
  * layout arithmetic linear (SURVEY §2G oracle strategy).
  */
object Ebml {

  // element value types — same ordinals as the reference (ebml.py:11)
  final val SINT = 0; final val UINT = 1; final val FLOAT = 2; final val STRING = 3
  final val UTF8 = 4; final val DATE = 5; final val MASTER = 6; final val BINARY = 7

  /** Matroska id→(name,type) subset (ebml.py:14-122). */
  val IdTable: Map[Long, (String, Int)] = Map(
    0x1a45dfa3L -> ("EBML", MASTER),
    0x4286L -> ("EBMLVersion", UINT),
    0x42f7L -> ("EBMLReadVersion", UINT),
    0x4282L -> ("DocType", UTF8),
    0x4287L -> ("DocTypeVersion", UINT),
    0x4285L -> ("DocTypeReadVersion", UINT),
    0xbfL -> ("CRC-32", BINARY), // RFC 8794 §11.3.1, first child of a master
    0x18538067L -> ("Segment", MASTER),
    0x1549a966L -> ("Info", MASTER),
    0x2ad7b1L -> ("TimecodeScale", UINT),
    0x4489L -> ("Duration", FLOAT),
    0x4461L -> ("DateUTC", DATE),
    0x7ba9L -> ("Title", UTF8),
    0x4d80L -> ("MuxingApp", UTF8),
    0x5741L -> ("WritingApp", UTF8),
    0x1654ae6bL -> ("Tracks", MASTER),
    0xaeL -> ("TrackEntry", MASTER),
    0xd7L -> ("TrackNumber", UINT),
    0x73c5L -> ("TrackUID", UINT),
    0x83L -> ("TrackType", UINT),
    0x23e383L -> ("DefaultDuration", UINT),
    0x536eL -> ("Name", STRING),
    0x22b59cL -> ("Language", STRING),
    0x86L -> ("CodecID", STRING),
    0x63a2L -> ("CodecPrivate", BINARY),
    0xe0L -> ("Video", MASTER),
    0xb0L -> ("PixelWidth", UINT),
    0xbaL -> ("PixelHeight", UINT),
    0xe1L -> ("Audio", MASTER),
    0xb5L -> ("SamplingFrequency", FLOAT),
    0x9fL -> ("Channels", UINT),
    0x1254c367L -> ("Tags", MASTER),
    0x7373L -> ("Tag", MASTER),
    0x63c0L -> ("Targets", MASTER),
    0x67c8L -> ("SimpleTag", MASTER),
    0x45a3L -> ("TagName", UTF8),
    0x447aL -> ("TagLanguage", STRING),
    0x4487L -> ("TagString", UTF8),
    0x4485L -> ("TagBinary", BINARY),
    0x1f43b675L -> ("Cluster", MASTER),
    0xe7L -> ("Timecode", UINT),
    0xa7L -> ("Position", UINT),
    0xa0L -> ("BlockGroup", MASTER),
    0xa1L -> ("Block", BINARY),
    0xa3L -> ("SimpleBlock", BINARY),
    0x9bL -> ("BlockDuration", UINT)
  )

  /** One parsed element head + decoded scalar value (masters recurse). */
  final case class Element(
      id: Long, name: String, typ: Int, size: Long, position: Long,
      longValue: Long, doubleValue: Double, stringValue: String,
      bytesValue: Array[Byte])

  final class EbmlException(msg: String) extends RuntimeException(msg)

  // ---- reader ----------------------------------------------------------

  /** Read a varint element ID at `pos` (marker bits kept, ebml.py:185-197).
    * Returns (id, bytesConsumed). */
  def readId(buf: Array[Byte], pos: Int): (Long, Int) = {
    val b1 = buf(pos) & 0xff
    val len =
      if ((b1 & 0x80) != 0) 1
      else if ((b1 & 0x40) != 0) 2
      else if ((b1 & 0x20) != 0) 3
      else if ((b1 & 0x10) != 0) 4
      else throw new EbmlException(f"invalid element ID (leading byte 0x$b1%02X)")
    var id = 0L
    var i = 0
    while (i < len) { id = (id << 8) | (buf(pos + i) & 0xffL); i += 1 }
    (id, len)
  }

  /** Read a varint size at `pos` (marker bit stripped; unknown-size
    * sentinel → -1; ebml.py:199-247). Returns (size, bytesConsumed). */
  def readSize(buf: Array[Byte], pos: Int): (Long, Int) = {
    val b1 = buf(pos) & 0xff
    var len = 0
    var mask = 0x80
    while (len < 8 && (b1 & mask) == 0) { len += 1; mask >>= 1 }
    if (len == 8 && (b1 & 1) == 0) throw new EbmlException("undefined element size")
    len += 1
    var s = (b1 & (mask - 1)).toLong
    var i = 1
    while (i < len) { s = (s << 8) | (buf(pos + i) & 0xffL); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    (if (s == allOnes) -1L else s, len)
  }

  private def readUint(buf: Array[Byte], pos: Int, n: Int): Long = {
    var v = 0L; var i = 0
    while (i < n) { v = (v << 8) | (buf(pos + i) & 0xffL); i += 1 }
    v
  }

  private def readSint(buf: Array[Byte], pos: Int, n: Int): Long = {
    val u = readUint(buf, pos, n)
    val nbits = 8 * n
    if (n < 8 && u >= (1L << (nbits - 1))) u - (1L << nbits) else u
  }

  /** Walk all elements depth-first (masters recursed into), tracking the
    * absolute position of each element head — the reference's
    * `ebmlReader.Position` key. Truncated trailing garbage ends the walk
    * (stream semantics). */
  def elements(buf: Array[Byte]): Seq[Element] = {
    val out = new ArrayBuffer[Element]()
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      var open = true
      while (open && pos < to) try {
        val start = pos
        val (id, idLen) = readId(buf, pos)
        pos += idLen
        val (size, szLen) = readSize(buf, pos)
        pos += szLen
        val (name, typ) = IdTable.getOrElse(id, (null, BINARY))
        val end =
          if (size < 0) to // unknown-size master: runs to container end
          else (pos + size.toInt).min(to)
        // a LEAF whose payload runs past the buffer is a truncated tail:
        // stop like stream end, uniformly across payload types (UINT
        // already stopped via read bounds, but a cut STRING threw an
        // uncaught StringIndexOutOfBounds and a cut BINARY silently
        // zero-padded — round-6 head-only-walk pin caught both)
        if (typ != MASTER && size >= 0 && pos + size > to)
          throw new EbmlException("truncated leaf payload")
        typ match {
          case MASTER =>
            out += Element(id, name, typ, size, start, 0L, 0.0, null, null)
            walk(pos, end)
          case UINT =>
            out += Element(id, name, typ, size, start, readUint(buf, pos, size.toInt), 0.0, null, null)
          case SINT =>
            out += Element(id, name, typ, size, start, readSint(buf, pos, size.toInt), 0.0, null, null)
          case FLOAT =>
            val d =
              if (size == 4) java.lang.Float.intBitsToFloat(readUint(buf, pos, 4).toInt).toDouble
              else java.lang.Double.longBitsToDouble(readUint(buf, pos, 8))
            out += Element(id, name, typ, size, start, 0L, d, null, null)
          case DATE =>
            // ns since 2001-01-01 (ebml.py:339-342) → keep raw ns in longValue
            out += Element(id, name, typ, size, start, readSint(buf, pos, size.toInt), 0.0, null, null)
          case STRING | UTF8 =>
            val s = new String(buf, pos, size.toInt, StandardCharsets.UTF_8)
            out += Element(id, name, typ, size, start, 0L, 0.0, s, null)
          case _ =>
            val b = java.util.Arrays.copyOfRange(buf, pos, pos + size.toInt)
            out += Element(id, name, typ, size, start, 0L, 0.0, null, b)
        }
        pos = end
      } catch {
        // truncated tail / garbage: stop like the reference's stream-end
        // handling (ebml.py:282-302 tolerates malformed heads)
        case _: EbmlException | _: ArrayIndexOutOfBoundsException => open = false
      }
    }
    walk(0, buf.length)
    out.toSeq
  }

  /** Filtered walk (ebml.py:307-327 InterestingElementNames): masters are
    * always descended; non-matching leaves are SKIPPED without decoding
    * their payload — the reference's way of fast-forwarding a fragment
    * stream to just the tag/boundary elements it cares about. */
  def elements(buf: Array[Byte], interesting: Set[String]): Seq[Element] =
    elements(buf, interesting, 0, buf.length)

  /** Range-bounded filtered walk over `[from, until)` of the ORIGINAL
    * buffer — positions stay absolute and no payload copy is made, so
    * a caller scoping to one master's payload (e.g. the first
    * TrackEntry) pays zero allocation for the scoping itself. */
  def elements(buf: Array[Byte], interesting: Set[String],
      rangeFrom: Int, rangeUntil: Int): Seq[Element] = {
    val out = new ArrayBuffer[Element]()
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      var open = true
      while (open && pos < to) try {
        val start = pos
        val (id, idLen) = readId(buf, pos)
        pos += idLen
        val (size, szLen) = readSize(buf, pos)
        pos += szLen
        val (name, typ) = IdTable.getOrElse(id, (null, BINARY))
        val end = if (size < 0) to else (pos + size.toInt).min(to)
        if (typ != MASTER && size >= 0 && pos + size > to)
          throw new EbmlException("truncated leaf payload")
        if (typ == MASTER) {
          if (name != null && interesting.contains(name))
            out += Element(id, name, typ, size, start, 0L, 0.0, null, null)
          walk(pos, end)
        } else if (name != null && interesting.contains(name)) {
          typ match {
            case UINT => out += Element(id, name, typ, size, start, readUint(buf, pos, size.toInt), 0.0, null, null)
            case SINT | DATE => out += Element(id, name, typ, size, start, readSint(buf, pos, size.toInt), 0.0, null, null)
            case FLOAT =>
              val d = if (size == 4) java.lang.Float.intBitsToFloat(readUint(buf, pos, 4).toInt).toDouble
                      else java.lang.Double.longBitsToDouble(readUint(buf, pos, 8))
              out += Element(id, name, typ, size, start, 0L, d, null, null)
            case STRING | UTF8 =>
              out += Element(id, name, typ, size, start, 0L, 0.0,
                new String(buf, pos, size.toInt, StandardCharsets.UTF_8), null)
            case _ =>
              out += Element(id, name, typ, size, start, 0L, 0.0, null,
                java.util.Arrays.copyOfRange(buf, pos, pos + size.toInt))
          }
        } // else: leaf payload skipped entirely — pos jumps over it
        pos = end
      } catch {
        case _: EbmlException | _: ArrayIndexOutOfBoundsException => open = false
      }
    }
    walk(rangeFrom, rangeUntil)
    out.toSeq
  }

  /** Split a continuous stream of concatenated fragments into
    * per-fragment byte slices with absolute start positions.
    *
    * The reference detects this boundary INSIDE an unbounded byte stream:
    * when a new EBML header's DocTypeReadVersion element arrives it
    * finalizes the previous fragment's tags and flushes the copy buffer
    * holding its bytes (parser.py:362-375). Seen at the byte level, that
    * boundary is exactly the next top-level EBML header id (0x1A45DFA3):
    * everything from one header to the next is one fragment. The walk is
    * top-level only — element payloads are skipped by size, never
    * decoded — so splitting is O(headers), not O(bytes). A truncated tail
    * (partial fragment at stream end) is dropped, matching the
    * reference's wait-for-more-bytes behavior. */
  def splitFragments(buf: Array[Byte]): Seq[(Long, Array[Byte])] = {
    val starts = new ArrayBuffer[Int]()
    var pos = 0
    var truncated = false
    while (!truncated && pos < buf.length) try {
      val (id, idLen) = readId(buf, pos)
      val (size, szLen) = readSize(buf, pos + idLen)
      if (id == 0x1a45dfa3L) starts += pos
      // unknown-size master (the standard encoding for live-streamed
      // Segments): it ends where the next EBML header begins, so keep
      // walking its CHILDREN — sized children are skipped whole, nested
      // unknown-size masters recurse into this same loop — until the
      // header id surfaces. Never byte-scan: a 0x1A45DFA3 pattern inside
      // a sized block payload must not fake a boundary.
      val next = if (size < 0) pos.toLong + idLen + szLen
                 else pos.toLong + idLen + szLen + size
      if (next > buf.length) truncated = true else pos = next.toInt
    } catch {
      case _: EbmlException | _: ArrayIndexOutOfBoundsException => truncated = true
    }
    val n = starts.length
    (0 until n).flatMap { i =>
      val s = starts(i)
      // a fragment is complete when the next header (or a clean stream
      // end) bounds it; a truncated tail is dropped
      val e = if (i + 1 < n) starts(i + 1) else if (truncated) -1 else pos
      if (e > s) Some((s.toLong, java.util.Arrays.copyOfRange(buf, s, e))) else None
    }
  }

  private val TagLeaves = Set("TagName", "TagString")
  private val BlockLeaves = Set("SimpleBlock", "Block")

  /** TagName/TagString pairs in document order (parser.py:352-366).
    * Filtered walk: every other leaf — including the cluster's media
    * payload — is skipped by size without decoding, exactly the
    * reference's InterestingElementNames fast-forward. */
  def tags(buf: Array[Byte]): Map[String, String] = {
    var lastName: String = null
    val m = Map.newBuilder[String, String]
    elements(buf, TagLeaves).foreach { e =>
      if (e.name == "TagName") lastName = e.stringValue
      else if (e.name == "TagString" && lastName != null) m += lastName -> e.stringValue
    }
    m.result()
  }

  /** Payloads of all SimpleBlock/Block elements (parser.py demuxes these
    * through libav; we surface the raw block for downstream decode).
    * Filtered walk — tag/metadata leaves are skipped undecoded. */
  def blocks(buf: Array[Byte]): Seq[Array[Byte]] =
    elements(buf, BlockLeaves).collect {
      case e if e.bytesValue != null => e.bytesValue
    }

  // ---- CRC-32 (RFC 8794 §11.3.1 / Matroska "CRC-32") -------------------

  /** The CRC-32 element id. Real muxers emit it as the FIRST child of
    * master elements; its 4-byte little-endian payload is the IEEE
    * CRC-32 of all the master's payload bytes AFTER the element
    * itself. */
  val Crc32Id = 0xbfL

  /** IEEE CRC-32 (the zlib polynomial RFC 8794 prescribes) over
    * `buf[from, until)`. */
  def crc32(buf: Array[Byte], from: Int, until: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(buf, from, until - from)
    c.getValue
  }

  /** The CRC-32 element checksumming `payload` — prepend it to a
    * master's payload to arm the master (the write side of
    * [[crcValid]]; the reference stream carries none, so this exists
    * for hermetic round-trip tests and for re-muxed output). */
  def crc32Element(payload: Array[Byte]): Array[Byte] = {
    val v = crc32(payload, 0, payload.length)
    element(Crc32Id, Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte))
  }

  /** Verify every CRC-32 element in the buffer against its enclosing
    * scope. The element walkers above skip CRC-32 by size like any
    * other leaf, so integrity is surfaced SEPARATELY through this
    * predicate (the A7/A8 queries' and the B13 source's `crc_ok`
    * column) instead of being silently ignored. Returns false iff some
    * scope's CRC-32 element is malformed — not the scope's first
    * element, or payload not exactly 4 bytes — or its stored value
    * mismatches the computed IEEE CRC-32 of the scope bytes following
    * it. A buffer carrying no CRC-32 elements (e.g. the AWS producer's
    * fragments) is vacuously valid, and a truncated head ends a
    * scope's walk without failing it — the walkers' leniency rule, so
    * crc_ok stays an integrity signal, not a well-formedness one. */
  def crcValid(buf: Array[Byte]): Boolean = {
    def walk(from: Int, to: Int): Boolean = {
      var pos = from
      while (pos < to) {
        var id = 0L; var body = 0; var size = 0L
        try {
          val (i, idLen) = readId(buf, pos)
          val (s, szLen) = readSize(buf, pos + idLen)
          id = i; size = s; body = pos + idLen + szLen
        } catch {
          case _: EbmlException | _: ArrayIndexOutOfBoundsException =>
            return true // truncated head: scope ends, not an integrity fail
        }
        val end =
          if (size < 0) to else math.min(to.toLong, body.toLong + size).toInt
        if (id == Crc32Id) {
          // spec placement: first element of its scope, 4-byte payload
          if (pos != from || size != 4L || body + 4 > to) return false
          val stored = (buf(body) & 0xffL) | ((buf(body + 1) & 0xffL) << 8) |
            ((buf(body + 2) & 0xffL) << 16) | ((buf(body + 3) & 0xffL) << 24)
          if (stored != crc32(buf, body + 4, to)) return false
        } else if (IdTable.get(id).exists(_._2 == MASTER)) {
          if (!walk(body, end)) return false
        }
        pos = end
      }
      true
    }
    buf == null || walk(0, buf.length)
  }

  // ---- writer ----------------------------------------------------------

  /** Write an element id (marker bits are part of the id value). */
  private def writeId(out: ByteArrayOutputStream, id: Long): Unit = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2 else if (id <= 0xffffffL) 3 else 4
    var i = len - 1
    while (i >= 0) { out.write(((id >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** Fixed 8-byte size varint (valid, non-minimal; keeps layout linear). */
  private def writeSize8(out: ByteArrayOutputStream, size: Long): Unit = {
    out.write(0x01)
    var i = 6
    while (i >= 0) { out.write(((size >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  def element(id: Long, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 12)
    writeId(out, id)
    writeSize8(out, payload.length.toLong)
    out.write(payload)
    out.toByteArray
  }

  /** Byte length of an element id on the wire. */
  def idLen(id: Long): Int =
    if (id <= 0xffL) 1 else if (id <= 0xffffL) 2 else if (id <= 0xffffffL) 3 else 4

  /** Cursor writer for single-buffer encodes: callers precompute every
    * element size bottom-up (trivial with the fixed 8-byte size varint),
    * then emit each byte exactly once — the nested [[element]] form
    * re-copies a payload at every nesting level (~4× per fragment).
    * Byte-identical output to the compositional writer (EbmlSpec pins
    * it). */
  final class Writer(val buf: Array[Byte]) {
    private var pos = 0
    /** Element head: big-endian id then the fixed 8-byte size varint. */
    def head(id: Long, size: Long): Unit = {
      var i = idLen(id) - 1
      while (i >= 0) { buf(pos) = ((id >> (8 * i)) & 0xff).toByte; pos += 1; i -= 1 }
      buf(pos) = 0x01; pos += 1
      i = 6
      while (i >= 0) { buf(pos) = ((size >> (8 * i)) & 0xff).toByte; pos += 1; i -= 1 }
    }
    def bytes(b: Array[Byte]): Unit = {
      System.arraycopy(b, 0, buf, pos, b.length); pos += b.length
    }
    def byte(v: Int): Unit = { buf(pos) = v.toByte; pos += 1 }
    def uint(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { buf(pos) = ((v >> (8 * i)) & 0xff).toByte; pos += 1; i -= 1 }
    }
    def position: Int = pos
  }

  def uintBytes(v: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var i = 0
    while (i < n) { b(n - 1 - i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream(parts.map(_.length).sum)
    parts.foreach(out.write)
    out.toByteArray
  }

  def simpleTag(name: String, value: String): Array[Byte] =
    element(0x67c8L, concat(element(0x45a3L, utf8(name)), element(0x4487L, utf8(value))))

  /** A SimpleBlock with the reference-observed lacing-free layout: track
    * vint 0x81, int16 relative timecode, flags byte, then frame bytes. */
  def simpleBlock(frame: Array[Byte], relTimecodeMs: Int = 0): Array[Byte] = {
    val header = Array[Byte](0x81.toByte,
      ((relTimecodeMs >> 8) & 0xff).toByte, (relTimecodeMs & 0xff).toByte, 0x80.toByte)
    element(0xa3L, concat(header, frame))
  }

  // ---- block lacing (Matroska "Block structure" / "Lacing") -----------

  /** Lacing mode constants: the block flags byte's bits 0x06. */
  val LaceNone = 0x00
  val LaceXiph = 0x02
  val LaceFixed = 0x04
  val LaceEbml = 0x06

  /** Raw vint at `pos` WITHOUT the unknown-size sentinel: lace sizes
    * and lace deltas never carry the all-ones "unknown" meaning, so an
    * all-ones lace size must parse as its literal value, not -1. */
  private def readVintRaw(buf: Array[Byte], pos: Int): (Long, Int) = {
    if (pos >= buf.length) throw new EbmlException("truncated lace vint")
    val b1 = buf(pos) & 0xff
    var len = 0
    var mask = 0x80
    while (len < 8 && (b1 & mask) == 0) { len += 1; mask >>= 1 }
    if (len == 8 && (b1 & 1) == 0) throw new EbmlException("invalid lace vint")
    len += 1
    if (pos + len > buf.length)
      throw new EbmlException("truncated lace vint") // honor the
    // documented EbmlException-on-malformed contract — without the
    // bounds check a cut size table escaped as AIOOBE
    var s = (b1 & (mask - 1)).toLong
    var i = 1
    while (i < len) { s = (s << 8) | (buf(pos + i) & 0xffL); i += 1 }
    (s, len)
  }

  /** Minimal unsigned vint (marker bit set; avoids the all-ones
    * pattern, which element-size readers treat as "unknown"). */
  def vint(v: Long): Array[Byte] = {
    require(v >= 0, s"vint value must be non-negative, got $v")
    var len = 1
    while (len < 8 && v > (1L << (7 * len)) - 2) len += 1
    val b = new Array[Byte](len)
    var i = 0
    while (i < len) { b(len - 1 - i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    b(0) = (b(0) | (0x80 >> (len - 1))).toByte
    b
  }

  /** Minimal SIGNED vint for EBML-lace deltas: raw = v + 2^(7·len−1)−1
    * (the spec's range-shift), len minimal for |v|. */
  def svint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && math.abs(v) > (1L << (7 * len - 1)) - 1) len += 1
    val raw = v + (1L << (7 * len - 1)) - 1
    val b = new Array[Byte](len)
    var i = 0
    while (i < len) { b(len - 1 - i) = ((raw >> (8 * i)) & 0xff).toByte; i += 1 }
    b(0) = (b(0) | (0x80 >> (len - 1))).toByte
    b
  }

  /** The frames inside one SimpleBlock/Block PAYLOAD, lacing-aware:
    * track vint (any width), int16 relative timecode, flags byte, then
    * the lace table and frame data per the flags' 0x06 bits — none /
    * Xiph (255-run size bytes) / fixed (equal split) / EBML (vint first
    * size, signed-vint deltas); the last frame's size is implied by the
    * remainder in Xiph/EBML. The reference only ever meets lacing-free
    * video blocks (parser.py demuxes via libav, which hides lacing),
    * but real Kinesis producers can lace audio tracks — public Matroska
    * spec, "Lacing". Throws [[EbmlException]] on a malformed lace
    * (negative/overrunning sizes, non-divisible fixed split). */
  def blockFrames(block: Array[Byte]): Seq[Array[Byte]] = {
    val (_, trackLen) = readVintRaw(block, 0)
    var pos = trackLen + 2 // relative timecode int16
    if (pos >= block.length) throw new EbmlException("truncated block header")
    val flags = block(pos) & 0xff
    pos += 1
    val lacing = flags & 0x06
    if (lacing == LaceNone) {
      if (pos > block.length) throw new EbmlException("truncated block header")
      return Seq(java.util.Arrays.copyOfRange(block, pos, block.length))
    }
    if (pos >= block.length) throw new EbmlException("truncated lace count")
    val n = (block(pos) & 0xff) + 1
    pos += 1
    val sizes = new Array[Long](n)
    lacing match {
      case LaceXiph =>
        var i = 0
        while (i < n - 1) {
          var s = 0L
          var b = 0
          do {
            if (pos >= block.length) throw new EbmlException("truncated Xiph lace")
            b = block(pos) & 0xff; s += b; pos += 1
          } while (b == 255)
          sizes(i) = s
          i += 1
        }
      case LaceEbml =>
        // n == 1: the only frame is the last (implied) — no size table
        val (first, fl) =
          if (n >= 2) readVintRaw(block, pos) else (0L, 0)
        pos += fl
        sizes(0) = first
        var i = 1
        while (i < n - 1) {
          val (raw, dl) = readVintRaw(block, pos)
          pos += dl
          sizes(i) = sizes(i - 1) + (raw - ((1L << (7 * dl - 1)) - 1))
          i += 1
        }
      case _ => // LaceFixed
        val rem = block.length - pos
        if (n == 0 || rem % n != 0)
          throw new EbmlException(s"fixed lacing: $rem bytes not divisible by $n")
        java.util.Arrays.fill(sizes, rem.toLong / n)
    }
    if (lacing != LaceFixed) {
      var known = 0L
      var i = 0
      while (i < n - 1) { known += sizes(i); i += 1 }
      sizes(n - 1) = (block.length - pos) - known
    }
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val s = sizes(i)
      if (s < 0 || pos + s > block.length)
        throw new EbmlException(s"lace size $s overruns block at frame $i")
      out(i) = java.util.Arrays.copyOfRange(block, pos, pos + s.toInt)
      pos += s.toInt
      i += 1
    }
    if (pos != block.length)
      throw new EbmlException("lace sizes do not consume the block payload")
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** A laced SimpleBlock: multiple frames in one block element.
    * `lacing` is one of [[LaceXiph]]/[[LaceFixed]]/[[LaceEbml]] (a
    * single frame with [[LaceNone]] degrades to [[simpleBlock]]'s
    * layout). Fixed lacing requires equal frame lengths, per spec. */
  def simpleBlockLaced(frames: Seq[Array[Byte]], lacing: Int,
      relTimecodeMs: Int = 0): Array[Byte] = {
    require(frames.nonEmpty && frames.length <= 256,
      s"lacing holds 1..256 frames, got ${frames.length}")
    if (lacing == LaceNone) {
      require(frames.length == 1, "lacing-free blocks hold exactly one frame")
      return simpleBlock(frames.head, relTimecodeMs)
    }
    val head = new ByteArrayOutputStream(64)
    head.write(0x81) // track 1
    head.write((relTimecodeMs >> 8) & 0xff); head.write(relTimecodeMs & 0xff)
    head.write(0x80 | lacing)
    head.write(frames.length - 1)
    lacing match {
      case LaceXiph =>
        frames.dropRight(1).foreach { f =>
          var s = f.length
          while (s >= 255) { head.write(255); s -= 255 }
          head.write(s)
        }
      case LaceEbml =>
        // the last frame's size is implied; n == 1 writes no table
        if (frames.length >= 2) {
          head.write(vint(frames.head.length.toLong))
          frames.sliding(2).toSeq.dropRight(1).foreach { case Seq(a, b) =>
            head.write(svint(b.length.toLong - a.length.toLong))
          }
        }
      case LaceFixed =>
        require(frames.forall(_.length == frames.head.length),
          "fixed lacing requires equal frame sizes")
      case other => throw new IllegalArgumentException(s"unknown lacing $other")
    }
    element(0xa3L, concat(head.toByteArray +: frames: _*))
  }
}
