package graft.bmff

import org.scalatest.funsuite.AnyFunSuite

class BmffSpec extends AnyFunSuite {
  import Bmff._

  test("clip layout: fixed positions, mdat varies by payload length; typed parse round-trips") {
    val props = "{\"k\":42}".getBytes("UTF-8")
    val buf = buildClip(7L, 123456789L, 11L, 250L, props)
    val bs = boxes(buf)
    val expect = Seq(
      ("ftyp", 0L, 24L, 0), ("moof", 24L, 68L, 0), ("mfhd", 32L, 16L, 1),
      ("traf", 48L, 44L, 1), ("tfhd", 56L, 16L, 2), ("tfdt", 72L, 20L, 2),
      ("mdat", 92L, 32L + props.length, 0))
    assert(bs.map(b => (b.typ, b.pos, b.size, b.depth)) == expect)
    assert(buf.length == 124 + props.length)
    val c = clip(buf)
    assert(c == Clip(7L, 123456789L, 7L, 11L, 250L, 24L + props.length))
    assert(java.util.Arrays.equals(clipPayload(buf), props),
      "mdat props bytes must surface verbatim from the payload walk")
    // the low-32 sequence mask on a >2^32 event id
    val big = clip(buildClip(1L << 33 | 5L, 1L, 2L, 3L, Array.emptyByteArray))
    assert(big.seq32 == 5L && big.eventId == (1L << 33 | 5L))
  }

  test("reader handles largesize, to-EOF size-0, and tfdt v0; truncation throws loudly") {
    // a largesize box: size field 1, 64-bit size follows the type
    val payload = Array[Byte](1, 2, 3)
    val large = concat(u32be(1L), fourcc("free"), u64be(16L + payload.length),
      payload)
    // a trailing size-0 box runs to the end of the buffer
    val tail = concat(u32be(0L), fourcc("mdat"), Array[Byte](9, 9, 9, 9, 9))
    val bs = boxes(concat(large, tail))
    assert(bs.map(b => (b.typ, b.pos, b.headLen, b.size)) == Seq(
      ("free", 0L, 16, 19L), ("mdat", 19L, 8, 13L)))
    // tfdt version 0: 32-bit baseMediaDecodeTime
    val v0 = concat(
      box("ftyp", fourcc("isom")),
      box("moof", fullBox("mfhd", 0, 0, u32be(3L)),
        box("traf", fullBox("tfdt", 0, 0, u32be(777L)))),
      box("mdat", u64be(1L), u64be(2L), u64be(3L)))
    assert(clip(v0).baseMs == 777L && clip(v0).seq32 == 3L)
    // structural strictness: an overrunning size and a truncated head
    // both throw with the position, never mis-walk
    val bad = concat(u32be(100L), fourcc("mdat"), Array[Byte](0))
    intercept[BmffException](boxes(bad))
    intercept[BmffException](boxes(Array[Byte](0, 0, 0)))
    // a box whose size undercuts its own head is rejected
    intercept[BmffException](
      boxes(concat(u32be(4L), fourcc("mdat"), Array[Byte](1, 2, 3, 4))))
  }

  test("stream splitter cuts at ftyp boundaries with absolute positions; malformed opens throw") {
    val a = buildClip(1L, 10L, 1L, 1L, "aa".getBytes)
    val b = buildClip(2L, 20L, 2L, 2L, "bbbb".getBytes)
    val got = splitClips(concat(a, b))
    assert(got.map(_._1) == Seq(0L, a.length.toLong))
    assert(got(0)._2.sameElements(a) && got(1)._2.sameElements(b))
    assert(clip(got(1)._2).eventId == 2L)
    intercept[BmffException](splitClips(box("mdat", u64be(1L))))
    assert(splitClips(Array.emptyByteArray).isEmpty)
  }
}
