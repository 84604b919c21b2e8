package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** G26 SEI census: byte-level TLV walk properties, pure JVM. The
  * Spark pipelines (mm_sei_census / mm_hevc_sei_census /
  * mm_random_access_index) are pinned by closed-form DuckDB oracles;
  * these pin the kernel — the generator ladder on both codecs, the
  * ff-escape paths the generator never writes, and the malformed-TLV
  * null contract. */
class SeiSpec extends AnyFunSuite {

  test("census matches the ladder arithmetic on every generator cell, both codecs") {
    for (eventId <- 0L to 23L; userId <- Seq(0L, 3L)) {
      for ((enc, hevc) <- Seq(
          (SeiKernels.h264SeiEncode(eventId, userId), false),
          (SeiKernels.hevcSeiEncode(eventId, userId), true))) {
        val g = SeiKernels.seiCensus(enc, hevc)
        assert(g != null, s"event $eventId hevc=$hevc nulled")
        assert(g.getLong(0) == 1)
        assert(g.getLong(1) == (if (eventId % 4 == 2) 2L else 1L))
        assert(g.getLong(2) == (if (eventId % 4 == 2) 1L else 0L))
        assert(g.getLong(3) == 1)
        assert(g.getLong(4) == eventId % 5, s"net bytes at $eventId")
      }
    }
  }

  test("SEI NAL leaves the G17/G19 censuses untouched (non-VCL, no slice bytes)") {
    val es = SeiKernels.h264SeiEncode(4L, 3L)
    val st = NalKernels.nalStats(es)
    // SPS + PPS + SEI + slices: one more NAL than the G17 stream,
    // identical IDR count and slice bytes
    val base = NalKernels.nalStats(NalKernels.h264Encode(4L, 3L))
    assert(st.getLong(1) == base.getLong(1) + 1)
    assert(st.getLong(2) == base.getLong(2))
    assert(st.getLong(3) == base.getLong(3))
    val hst = HevcKernels.hevcStats(SeiKernels.hevcSeiEncode(4L, 3L))
    val hbase = HevcKernels.hevcStats(HevcKernels.hevcEncode(4L, 3L))
    assert(hst.getLong(1) == hbase.getLong(1) + 1)
    assert(hst.getLong(3) == hbase.getLong(3))
  }

  /** A hand-built H.264 SEI NAL in an Annex-B stream. */
  private def seiStream(rbsp: Array[Byte]): Array[Byte] =
    NalKernels.assemble(0L, Seq(NalKernels.nal(6, rbsp)))

  test("ff-escaped type and size bytes decode (values the generator never writes)") {
    // payloadType 300 = ff + 45; payloadSize 260 = ff + 5
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(45)     // type 300 (neither counted kind)
    out.write(0xff); out.write(5)      // size 260
    out.write(new Array[Byte](260), 0, 260)
    // then a user_data message with a 255-escape boundary size:
    // size 255 = ff + 0 -> 16 UUID + 239 net bytes
    out.write(5)
    out.write(0xff); out.write(0)
    out.write(new Array[Byte](255), 0, 255)
    out.write(0x80)
    val g = SeiKernels.seiCensus(seiStream(out.toByteArray), hevc = false)
    assert(g != null)
    assert(g.getLong(0) == 1 && g.getLong(1) == 2)
    assert(g.getLong(2) == 0 && g.getLong(3) == 1)
    assert(g.getLong(4) == 255 - 16)
  }

  test("malformed SEI rbsp nulls, never misparses") {
    // truncated payload (size overruns)
    assert(SeiKernels.seiCensus(seiStream(
      Array[Byte](5, 20, 1, 2, 3)), hevc = false) == null)
    // missing trailing byte
    val noTrail = new java.io.ByteArrayOutputStream()
    noTrail.write(5); noTrail.write(16)
    noTrail.write(new Array[Byte](16), 0, 16)
    assert(SeiKernels.seiCensus(seiStream(noTrail.toByteArray),
      hevc = false) == null)
    // empty SEI NAL (trailing byte only, zero messages)
    assert(SeiKernels.seiCensus(seiStream(Array[Byte](0x80.toByte)),
      hevc = false) == null)
    // user_data shorter than its UUID
    val shortUuid = new java.io.ByteArrayOutputStream()
    shortUuid.write(5); shortUuid.write(8)
    shortUuid.write(new Array[Byte](8), 0, 8)
    shortUuid.write(0x80)
    assert(SeiKernels.seiCensus(seiStream(shortUuid.toByteArray),
      hevc = false) == null)
    // ff-run that never terminates
    assert(SeiKernels.seiCensus(seiStream(
      Array.fill[Byte](6)(0xff.toByte)), hevc = false) == null)
    // unparseable container / null
    assert(SeiKernels.seiCensus(Array[Byte](1, 2, 3), hevc = false) == null)
    assert(SeiKernels.seiCensus(null, hevc = false) == null)
  }
}
