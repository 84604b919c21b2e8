package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** H.264 structural NAL parsing (G17/G18): kernel properties, pure JVM.
  * The Spark-side pipeline (mm_nal_census / mm_sps_dims) is pinned by
  * the DuckDB ramp-arithmetic oracle; these pin the kernels themselves
  * — emulation prevention in both directions, Exp-Golomb round trips,
  * start-code vs length-prefix walks, SPS branches the generator never
  * emits (high profile, POC types 0/1, interlaced, monochrome). */
class NalSpec extends AnyFunSuite {

  // ---- emulation prevention --------------------------------------------

  test("EP escape/strip round-trips every 00 00 0x boundary case") {
    val cases = Seq(
      Array[Byte](0, 0, 0),                // 00 00 00 -> 00 00 03 00
      Array[Byte](0, 0, 1),                // fake start code
      Array[Byte](0, 0, 2),
      Array[Byte](0, 0, 3),                // ambiguous EP tail
      Array[Byte](0, 0, 4),                // NOT escaped (> 3)
      Array[Byte](0, 0, 0, 0, 1),          // crossing runs
      Array[Byte](0, 0, 3, 0, 0, 1, 0, 0), // mixed
      Array[Byte](1, 2, 3, 4),             // nothing to escape
      Array[Byte]())
    for (rbsp <- cases) {
      val wire = NalKernels.epEscape(rbsp, 0)
      // no unescaped start-code-like run survives on the wire (00 00 03
      // is legal: it IS the escape marker — §7.4.1.1 forbids only
      // 00 00 00 / 00 00 01 / 00 00 02 inside a NAL)
      for (i <- 0 until wire.length - 2)
        assert(!(wire(i) == 0 && wire(i + 1) == 0 && (wire(i + 2) & 0xff) <= 2),
          s"unescaped 00 00 ${wire(i + 2)} in ${wire.mkString(",")}")
      val back = NalKernels.epStrip(wire, 0, wire.length)
      assert(back.toSeq == rbsp.toSeq, s"EP round-trip broke ${rbsp.mkString(",")}")
      assert(NalKernels.epStripLen(wire, 0, wire.length) == rbsp.length)
    }
    // 00 00 04 passes through unescaped (the > 3 rule)
    assert(NalKernels.epEscape(Array[Byte](0, 0, 4), 0).toSeq == Seq[Byte](0, 0, 4))
  }

  // ---- Exp-Golomb -------------------------------------------------------

  test("ue(v) writer/reader round-trip across code-length boundaries") {
    for (v <- Seq(0, 1, 2, 3, 6, 7, 14, 15, 30, 31, 62, 255, 1000, 65534)) {
      val w = new NalKernels.BitWriter
      w.ue(v); w.stop()
      val r = new NalKernels.BitReader(w.toBytes)
      assert(r.ue() == v, s"ue($v) round-trip failed")
    }
    // interleaved fields survive bit packing
    val w = new NalKernels.BitWriter
    w.u(5, 3); w.ue(9); w.u(1, 1); w.ue(0); w.stop()
    val r = new NalKernels.BitReader(w.toBytes)
    assert(r.u(3) == 5 && r.ue() == 9 && r.u(1) == 1 && r.ue() == 0)
  }

  test("se(v) mapping: ue codeNum k -> (-1)^(k+1) * ceil(k/2)") {
    def seBytes(ue: Int): Array[Byte] = {
      val w = new NalKernels.BitWriter
      w.ue(ue); w.stop(); w.toBytes
    }
    val expect = Seq(0 -> 0, 1 -> 1, 2 -> -1, 3 -> 2, 4 -> -2, 5 -> 3)
    for ((k, se) <- expect)
      assert(new NalKernels.BitReader(seBytes(k)).se() == se)
  }

  // ---- stream walks ------------------------------------------------------

  test("census over both container forms matches the generator's arithmetic") {
    for (eventId <- 0L to 24L; userId <- Seq(0L, 1L, 2L, 3L, 7L)) {
      val es = NalKernels.h264Encode(eventId, userId)
      val fmt = NalKernels.nalFormat(es)
      assert(fmt != null)
      assert(fmt.toString == (if (eventId % 2 == 0) "annexb" else "avcc"))
      val units = NalKernels.nalUnits(es)
      assert(units != null)
      val nSlices = (1 + eventId % 3).toInt
      assert(units.numElements == 2 + nSlices)
      val rows = (0 until units.numElements)
        .map(i => units.getStruct(i, 3))
      assert(rows(0).getLong(0) == 7 && rows(0).getLong(1) == 3) // SPS
      assert(rows(1).getLong(0) == 8 && rows(1).getLong(1) == 3) // PPS
      val sliceType = if (eventId % 4 == 0) 5L else 1L
      val refIdc = if (eventId % 4 == 0) 3L else 2L
      for (rr <- rows.drop(2)) {
        assert(rr.getLong(0) == sliceType && rr.getLong(1) == refIdc)
        assert(rr.getLong(2) == NalKernels.SliceRbspLen.toLong,
          s"EP strip drifted at event $eventId")
      }
    }
  }

  test("fused nal_stats equals the per-NAL array census on every cell and nulls together") {
    for (eventId <- 0L to 24L; userId <- Seq(0L, 1L, 2L, 3L, 7L)) {
      val es = NalKernels.h264Encode(eventId, userId)
      val st = NalKernels.nalStats(es)
      val units = NalKernels.nalUnits(es)
      val rows = (0 until units.numElements).map(i => units.getStruct(i, 3))
      assert(st.getUTF8String(0).toString ==
        NalKernels.nalFormat(es).toString)
      assert(st.getLong(1) == rows.length.toLong)
      assert(st.getLong(2) == rows.count(_.getLong(0) == 5L).toLong)
      assert(st.getLong(3) ==
        rows.filter(r => r.getLong(0) == 1L || r.getLong(0) == 5L)
          .map(_.getLong(2)).sum)
    }
    assert(NalKernels.nalStats(Array[Byte](1, 2, 3)) == null)
    assert(NalKernels.nalStats(
      Array[Byte](0, 0, 0, 1, 0x80.toByte, 1)) == null)
  }

  test("SPS dims recover profile/level/cropped geometry for every generator cell") {
    for (eventId <- 0L to 15L; userId <- 0L to 7L) {
      val dims = NalKernels.spsDims(NalKernels.h264Encode(eventId, userId))
      assert(dims != null)
      assert(dims.getLong(0) == 66 + 11 * (userId % 2))
      assert(dims.getLong(1) == 10 * (1 + eventId % 4))
      assert(dims.getLong(2) == 16 * (4 + userId % 4) - 2 * (eventId % 2))
      assert(dims.getLong(3) == 16 * (4 + eventId % 4) - 2 * (userId % 2))
    }
  }

  test("generic SPS branches: POC type 0/1, interlaced, monochrome, high profile") {
    // hand-build SPSes through the writer and wrap them Annex-B
    def spsStream(build: NalKernels.BitWriter => Unit): Array[Byte] = {
      val w = new NalKernels.BitWriter
      build(w)
      w.stop()
      val esc = NalKernels.epEscape(w.toBytes, 0)
      Array[Byte](0, 0, 0, 1, 0x67) ++ esc
    }
    // POC type 0 with an extra lsb field; no cropping; 4 x 3 mbs
    val poc0 = spsStream { w =>
      w.u(66, 8); w.u(0, 8); w.u(20, 8)
      w.ue(0); w.ue(0); w.ue(0); w.ue(4) // sps_id, frame_num, poc0, lsb
      w.ue(1); w.u(0, 1)
      w.ue(3); w.ue(2)                   // 4 x 3 macroblocks
      w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
    }
    var d = NalKernels.spsDims(poc0)
    assert(d != null && d.getLong(2) == 64 && d.getLong(3) == 48)
    // POC type 1 with a 2-entry offset cycle
    val poc1 = spsStream { w =>
      w.u(77, 8); w.u(0, 8); w.u(31, 8)
      w.ue(0); w.ue(0); w.ue(1)
      w.u(0, 1); w.ue(2); w.ue(2)        // delta_zero, se(-1), se(-1)
      w.ue(2); w.ue(4); w.ue(3)          // 2-entry cycle: se(-2), se(2)
      w.ue(1); w.u(0, 1)
      w.ue(1); w.ue(1)                   // 2 x 2 macroblocks
      w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
    }
    d = NalKernels.spsDims(poc1)
    assert(d != null && d.getLong(2) == 32 && d.getLong(3) == 32)
    // interlaced (frame_mbs_only = 0): height doubles per map unit and
    // the mb_adaptive flag must be consumed
    val interlaced = spsStream { w =>
      w.u(66, 8); w.u(0, 8); w.u(30, 8)
      w.ue(0); w.ue(0); w.ue(2); w.ue(1); w.u(0, 1)
      w.ue(1); w.ue(1)                   // 2 x 2 map units
      w.u(0, 1); w.u(1, 1)               // frame_mbs_only=0, mb_adaptive=1
      w.u(1, 1); w.u(0, 1); w.u(0, 1)
    }
    d = NalKernels.spsDims(interlaced)
    assert(d != null && d.getLong(2) == 32 && d.getLong(3) == 64)
    // high profile 100, monochrome (chroma_format_idc 0), cropping in
    // monochrome units (CropUnitX 1, CropUnitY 2 - 1 = 1)
    val high = spsStream { w =>
      w.u(100, 8); w.u(0, 8); w.u(40, 8)
      w.ue(0)
      w.ue(0)                            // chroma_format_idc 0
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1) // bit depths, bypass, no scaling
      w.ue(0); w.ue(2); w.ue(1); w.u(0, 1)
      w.ue(3); w.ue(3)                   // 4 x 4 macroblocks
      w.u(1, 1); w.u(1, 1)
      w.u(1, 1); w.ue(1); w.ue(2); w.ue(0); w.ue(4) // crop l1 r2 t0 b4
      w.u(0, 1)
    }
    d = NalKernels.spsDims(high)
    assert(d != null && d.getLong(0) == 100)
    assert(d.getLong(2) == 64 - 1 * 3 && d.getLong(3) == 64 - 1 * 4)
    // scaling-matrix SPS: declared out of scope -> null, not garbage
    val scaling = spsStream { w =>
      w.u(100, 8); w.u(0, 8); w.u(40, 8)
      w.ue(0); w.ue(1); w.ue(0); w.ue(0); w.u(0, 1)
      w.u(1, 1)                          // seq_scaling_matrix_present
    }
    assert(NalKernels.spsDims(scaling) == null)
  }

  test("malformed inputs return null, never throw") {
    assert(NalKernels.nalUnits(null) == null)
    assert(NalKernels.nalUnits(Array[Byte](1, 2, 3)) == null)
    assert(NalKernels.nalFormat(Array[Byte](0, 0, 0, 0, 0)) == null)
    // AVCC length overruns the buffer
    assert(NalKernels.nalUnits(Array[Byte](0, 0, 0, 9, 0x41, 1, 2)) == null)
    // forbidden_zero_bit set in a NAL header
    assert(NalKernels.nalUnits(
      Array[Byte](0, 0, 0, 1, 0x80.toByte, 1, 2, 3)) == null)
    // truncated SPS: bit reader runs dry -> null
    assert(NalKernels.spsDims(Array[Byte](0, 0, 0, 1, 0x67, 0x42)) == null)
    // adversarial SPS with an absurd ue-coded width must null, not wrap
    // to garbage dimensions: 24 leading zeros put pic_width around 2^24
    // map units, past the plausibility guard
    val huge = {
      val w = new NalKernels.BitWriter
      w.u(66, 8); w.u(0, 8); w.u(30, 8)
      w.ue(0); w.ue(0); w.ue(2); w.ue(1); w.u(0, 1)
      w.ue((1 << 24) + 5)                // pic_width_in_mbs_minus1
      w.ue(1); w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
      w.stop()
      Array[Byte](0, 0, 0, 1, 0x67) ++ NalKernels.epEscape(w.toBytes, 0)
    }
    assert(NalKernels.spsDims(huge) == null)
    // a stream with no SPS has no dims
    assert(NalKernels.spsDims(Array[Byte](0, 0, 0, 1, 0x41, 1, 2, 3)) == null)
  }

  test("empty Annex-B ranges are malformed: null, never an OOB read (r18 fix)") {
    // buffer ENDING with a start code: the trailing range would be empty
    // (nalStart == length) and nalUnits/nalStats/spsDims would read past
    // the end — the round-17 crash repro, now the family's null
    val trailing = Array[Byte](0, 0, 1, 0x67, 0x42, 0, 0, 1)
    assert(NalKernels.nalUnits(trailing) == null)
    assert(NalKernels.nalStats(trailing) == null)
    assert(NalKernels.spsDims(trailing) == null)
    assert(NalKernels.nalFormat(trailing) == null)
    // ... and with the 4-byte form of the trailing start code
    assert(NalKernels.nalUnits(
      Array[Byte](0, 0, 1, 0x67, 0x42, 0, 0, 0, 1)) == null)
    // an empty NAL between two ADJACENT start codes previously yielded a
    // garbage (nal_type 0) row by reading the next start code's byte
    assert(NalKernels.nalUnits(
      Array[Byte](0, 0, 1, 0, 0, 1, 0x41, 1, 2)) == null)
    assert(NalKernels.nalStats(
      Array[Byte](0, 0, 1, 0, 0, 1, 0x41, 1, 2)) == null)
    // a lone start code followed only by trailing zeros
    assert(NalKernels.nalUnits(Array[Byte](0, 0, 0, 1, 0)) == null)
  }
}
