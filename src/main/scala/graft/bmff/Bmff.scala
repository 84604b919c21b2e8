package graft.bmff

/** Minimal ISO Base Media File Format (MP4 / fMP4) box codec — the
  * OTHER container Kinesis Video serves: `GetMedia` (the reference's
  * path, parser.py:313-386) streams MKV, but `GetClip` returns MP4 and
  * the HLS/DASH endpoints serve fMP4 segments, so a consumer that
  * switches endpoints meets this format with the same tag payloads.
  * The box grammar is the 14496-12 core: box = [u32 size]["4cc" type]
  * [payload]; size == 1 ⇒ a 64-bit largesize follows the type;
  * size == 0 ⇒ the box extends to the end of its enclosing scope (the
  * streaming-tail form); container boxes nest child boxes directly.
  *
  * Like [[graft.ebml.Ebml]] this is an independent re-implementation
  * from the public spec — writer + positional reader — NOT a port of
  * anything in the reference (which never parses MP4; that is the
  * point: the capability a real consumer needs next).
  */
object Bmff {

  final case class Box(typ: String, pos: Long, headLen: Int, size: Long,
      depth: Int)

  final class BmffException(msg: String) extends RuntimeException(msg)

  /** Container types whose payload is a sequence of child boxes (the
    * subset our fragments use plus the common movie-box chain). */
  val Containers: Set[String] =
    Set("moov", "trak", "mdia", "minf", "stbl", "moof", "traf", "mvex",
      "edts")

  def u32be(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  def u64be(v: Long): Array[Byte] = u32be(v >>> 32) ++ u32be(v & 0xffffffffL)

  def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var o = 0
    parts.foreach { p => System.arraycopy(p, 0, out, o, p.length); o += p.length }
    out
  }

  /** A compact box (32-bit size head). The writer never needs the
    * largesize form at fragment scale; the READER supports it. */
  def box(typ: String, payloads: Array[Byte]*): Array[Byte] = {
    val body = concat(payloads: _*)
    concat(u32be(8L + body.length), fourcc(typ), body)
  }

  /** FullBox: 1-byte version + 24-bit flags prefix the payload. */
  def fullBox(typ: String, version: Int, flags: Int,
      payloads: Array[Byte]*): Array[Byte] =
    box(typ, concat(Array(version.toByte,
      ((flags >>> 16) & 0xff).toByte, ((flags >>> 8) & 0xff).toByte,
      (flags & 0xff).toByte) +: payloads: _*))

  /** The graft fMP4 clip: ftyp, then one movie fragment —
    * moof(mfhd(sequence = event id's low 32), traf(tfhd(track 1,
    * default-base-is-moof), tfdt v1 (64-bit baseMediaDecodeTime =
    * producer ms))) — then mdat carrying the full 64-bit ids/value and
    * the props payload verbatim (the EBML fixture's SimpleBlock role). */
  def buildClip(eventId: Long, tsMs: Long, userId: Long, valueC: Long,
      props: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp", fourcc("isom"), u32be(512L), fourcc("isom"),
      fourcc("mp41"))
    val mfhd = fullBox("mfhd", 0, 0, u32be(eventId & 0xffffffffL))
    val tfhd = fullBox("tfhd", 0, 0x20000, u32be(1L))
    val tfdt = fullBox("tfdt", 1, 0, u64be(tsMs))
    val traf = box("traf", tfhd, tfdt)
    val moof = box("moof", mfhd, traf)
    val mdat = box("mdat", u64be(eventId), u64be(userId), u64be(valueC),
      if (props == null) Array.emptyByteArray else props)
    concat(ftyp, moof, mdat)
  }

  def readU32(buf: Array[Byte], pos: Int): Long =
    ((buf(pos) & 0xffL) << 24) | ((buf(pos + 1) & 0xffL) << 16) |
      ((buf(pos + 2) & 0xffL) << 8) | (buf(pos + 3) & 0xffL)

  def readU64(buf: Array[Byte], pos: Int): Long =
    (readU32(buf, pos) << 32) | readU32(buf, pos + 4)

  /** Positional box walk (the ebml.py Position semantics applied to
    * BMFF): every box head in document order with its absolute
    * position, head length, total size, and nesting depth. Strict on
    * structure — a size smaller than its own head or overrunning the
    * enclosing scope throws, matching the EBML walk's truncated-leaf
    * rule. */
  def boxes(buf: Array[Byte]): Seq[Box] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var pos = from
      while (pos < to) {
        if (pos + 8 > to) throw new BmffException(
          s"truncated box head at $pos (scope ends $to)")
        val sz32 = readU32(buf, pos)
        val typ = new String(buf, pos + 4, 4, "US-ASCII")
        var headLen = 8
        val size =
          if (sz32 == 1L) {
            if (pos + 16 > to) throw new BmffException(
              s"truncated largesize head at $pos")
            headLen = 16
            readU64(buf, pos + 8)
          } else if (sz32 == 0L) (to - pos).toLong
          else sz32
        if (size < headLen) throw new BmffException(
          s"box '$typ' size $size below its own head at $pos")
        if (pos + size > to) throw new BmffException(
          s"box '$typ' overruns its scope at $pos ($size past $to)")
        out += Box(typ, pos.toLong, headLen, size, depth)
        if (Containers(typ))
          walk(pos + headLen, (pos + size).toInt, depth + 1)
        pos += size.toInt
      }
    }
    walk(0, buf.length, 0)
    out.toSeq
  }

  /** Continuous-stream clip splitting — the A8 GetMedia boundary rule
    * applied to the fMP4 endpoints (HLS segments arrive back to back
    * on one connection): a clip starts at each top-level `ftyp` and
    * runs to the next one (or EOF). A stream not opening with `ftyp`
    * is malformed and throws, like the EBML splitter's header rule. */
  def splitClips(buf: Array[Byte]): Seq[(Long, Array[Byte])] = {
    if (buf.isEmpty) return Nil
    val tops = boxes(buf).filter(_.depth == 0)
    if (tops.isEmpty || tops.head.typ != "ftyp")
      throw new BmffException("stream does not open with an ftyp box")
    val starts = tops.filter(_.typ == "ftyp").map(_.pos)
    val bounds = starts :+ buf.length.toLong
    starts.indices.map { i =>
      (bounds(i), java.util.Arrays.copyOfRange(buf,
        bounds(i).toInt, bounds(i + 1).toInt))
    }
  }

  final case class Clip(seq32: Long, baseMs: Long, eventId: Long,
      userId: Long, valueC: Long, mdatLen: Long)

  /** Typed clip parse: locate mfhd / tfdt / mdat via the walk and
    * decode the graft payload. tfdt version 0 (32-bit time) is read
    * too — the spec-compliant short form a foreign muxer may emit. */
  def clip(buf: Array[Byte]): Clip = {
    val bs = boxes(buf)
    def find(t: String): Box = bs.find(_.typ == t).getOrElse(
      throw new BmffException(s"no '$t' box in clip"))
    val mfhd = find("mfhd")
    val seq = readU32(buf, mfhd.pos.toInt + mfhd.headLen + 4)
    val tfdt = find("tfdt")
    val tp = tfdt.pos.toInt + tfdt.headLen
    val baseMs =
      if (buf(tp) == 1.toByte) readU64(buf, tp + 4)
      else readU32(buf, tp + 4)
    val mdat = find("mdat")
    val mp = mdat.pos.toInt + mdat.headLen
    if (mdat.size < mdat.headLen + 24) throw new BmffException(
      s"mdat too short for the graft payload (${mdat.size})")
    Clip(seq, baseMs, readU64(buf, mp), readU64(buf, mp + 8),
      readU64(buf, mp + 16), mdat.size - mdat.headLen)
  }

  /** The mdat props payload behind the 24-byte graft id/value head —
    * a SEPARATE walk from [[clip]] so the four hot per-row parse paths
    * (roundtrip, split, transmux, the fragment source) never pay the
    * payload copy; only the fMP4→MKV direction materializes it. */
  def clipPayload(buf: Array[Byte]): Array[Byte] = {
    val mdat = boxes(buf).find(_.typ == "mdat").getOrElse(
      throw new BmffException("no 'mdat' box in clip"))
    val mp = mdat.pos.toInt + mdat.headLen
    if (mdat.size < mdat.headLen + 24) throw new BmffException(
      s"mdat too short for the graft payload (${mdat.size})")
    java.util.Arrays.copyOfRange(buf, mp + 24,
      mp + (mdat.size - mdat.headLen).toInt)
  }
}
