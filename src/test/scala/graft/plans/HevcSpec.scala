package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** H.265/HEVC structural NAL parsing (G19/G20): kernel properties, pure
  * JVM. The Spark-side pipeline (mm_hevc_census / mm_hevc_sps) is
  * pinned by the DuckDB ramp-arithmetic oracle; these pin the kernels —
  * the 2-byte header split, IRAP typing, emulation prevention through
  * the shared strip, and SPS branches the generator never emits
  * (sub-layer PTL blocks, 4:2:2/4:4:4 chroma, no conformance window). */
class HevcSpec extends AnyFunSuite {
  import NalKernels.{BitWriter, epEscape}

  /** Assemble one Annex-B HEVC NAL from a raw (pre-EP) RBSP. */
  private def annexbNal(nalType: Int, rbsp: Array[Byte],
      tidPlus1: Int = 1): Array[Byte] =
    Array[Byte](0, 0, 0, 1, ((nalType & 0x3f) << 1).toByte,
      tidPlus1.toByte) ++ epEscape(rbsp, 0)

  test("census over both container forms matches the generator's arithmetic") {
    for (eventId <- 0L to 24L; userId <- Seq(0L, 1L, 2L, 3L, 7L)) {
      val es = HevcKernels.hevcEncode(eventId, userId)
      val st = HevcKernels.hevcStats(es)
      assert(st != null)
      assert(st.getUTF8String(0).toString ==
        (if (eventId % 2 == 0) "annexb" else "hvcc"))
      val nSlices = (1 + eventId % 3).toInt
      assert(st.getLong(1) == 3L + nSlices) // VPS + SPS + PPS + slices
      assert(st.getLong(2) ==
        (if (eventId % 4 == 0) nSlices.toLong else 0L))
      assert(st.getLong(3) == HevcKernels.SliceRbspLen.toLong * nSlices,
        s"EP strip drifted at event $eventId")
    }
  }

  test("SPS dims recover profile/level/conformance-cropped geometry for every generator cell") {
    for (eventId <- 0L to 15L; userId <- 0L to 7L) {
      val d = HevcKernels.hevcSpsDims(HevcKernels.hevcEncode(eventId, userId))
      assert(d != null)
      assert(d.getLong(0) == 1 + userId % 2)
      assert(d.getLong(1) == 60 + 30 * (eventId % 4))
      assert(d.getLong(2) == 8 * (8 + userId % 4) - 2 * (eventId % 2))
      assert(d.getLong(3) == 8 * (8 + eventId % 4) - 2 * (userId % 2))
    }
  }

  test("SPS branches the generator never emits: sub-layer PTL, 4:2:2/4:4:4 chroma units, no window") {
    // hand-rolled SPS: max_sub_layers_minus1 = 2 with one profile block
    // and one level byte present, chroma 4:2:2 (SubWidthC 2/SubHeightC 1),
    // window right=2/bottom=3 -> width 100-2*2=96... in chroma units:
    // 4:2:2 subtracts 2*right horizontally, 1*bottom vertically
    def sps(chromaIdc: Int, w: Int, h: Int, window: Option[(Int, Int)],
        subLayers: Int = 0): Array[Byte] = {
      val b = new BitWriter
      b.u(0, 4); b.u(subLayers, 3); b.u(1, 1)
      b.u(0, 2); b.u(0, 1); b.u(4, 5)   // profile_idc 4 (REXT)
      b.u(0, 32); b.u(15, 4)
      b.u(0, 32); b.u(0, 12)
      b.u(120, 8)                        // level 4.0
      if (subLayers > 0) {
        // first sub-layer: profile+level present; rest absent
        b.u(1, 1); b.u(1, 1)
        for (_ <- 1 until subLayers) { b.u(0, 1); b.u(0, 1) }
        b.u(0, 2 * (8 - subLayers))      // alignment
        b.u(0, 32); b.u(0, 32); b.u(0, 24) // sub-layer profile block
        b.u(90, 8)                       // sub-layer level
      }
      b.ue(0)
      b.ue(chromaIdc)
      if (chromaIdc == 3) b.u(0, 1)      // separate_colour_plane_flag
      b.ue(w); b.ue(h)
      window match {
        case Some((r, bo)) =>
          b.u(1, 1); b.ue(0); b.ue(r); b.ue(0); b.ue(bo)
        case None => b.u(0, 1)
      }
      b.ue(0); b.ue(0)                   // bit depths
      b.stop()
      annexbNal(HevcKernels.SPS_NUT, b.toBytes)
    }
    val d422 = HevcKernels.hevcSpsDims(sps(2, 100, 60, Some((2, 3))))
    assert(d422 != null && d422.getLong(2) == 100 - 2 * 2 &&
      d422.getLong(3) == 60 - 1 * 3)
    val d444 = HevcKernels.hevcSpsDims(sps(3, 100, 60, Some((2, 3))))
    assert(d444 != null && d444.getLong(2) == 98 && d444.getLong(3) == 57)
    val dNoWin = HevcKernels.hevcSpsDims(sps(1, 64, 48, None))
    assert(dNoWin != null && dNoWin.getLong(2) == 64 && dNoWin.getLong(3) == 48)
    val dSub = HevcKernels.hevcSpsDims(sps(1, 64, 48, Some((1, 1)), subLayers = 2))
    assert(dSub != null && dSub.getLong(0) == 4 && dSub.getLong(1) == 120 &&
      dSub.getLong(2) == 62 && dSub.getLong(3) == 46)
  }

  test("malformed inputs return null, never throw") {
    assert(HevcKernels.hevcStats(Array[Byte](1, 2, 3)) == null)
    // forbidden_zero_bit set
    assert(HevcKernels.hevcStats(
      Array[Byte](0, 0, 0, 1, 0x80.toByte, 1, 9)) == null)
    // nuh_temporal_id_plus1 == 0 (spec: never 0)
    assert(HevcKernels.hevcStats(
      Array[Byte](0, 0, 0, 1, 0x02, 0x00, 9)) == null)
    // a NAL shorter than its own 2-byte header
    assert(HevcKernels.hevcStats(
      Array[Byte](0, 0, 0, 1, 0x40, 0, 0, 1, 0x40, 1, 9)) == null)
    // truncated SPS: bit reader runs dry -> null
    assert(HevcKernels.hevcSpsDims(
      Array[Byte](0, 0, 0, 1, 0x42, 1, 0x01)) == null)
    // no SPS in the stream
    assert(HevcKernels.hevcSpsDims(
      Array[Byte](0, 0, 0, 1, 0x02, 1, 9, 9)) == null)
    // absurd ue-coded geometry nulls instead of wrapping (the family's
    // adversarial-value guard)
    val huge = {
      val b = new BitWriter
      b.u(0, 4); b.u(0, 3); b.u(1, 1)
      b.u(0, 2); b.u(0, 1); b.u(1, 5); b.u(0, 32); b.u(0, 4)
      b.u(0, 32); b.u(0, 12); b.u(120, 8)
      b.ue(0); b.ue(1)
      b.ue((1 << 25) + 7); b.ue(64)      // pic_width past the guard
      b.u(0, 1); b.ue(0); b.ue(0)
      b.stop()
      annexbNal(HevcKernels.SPS_NUT, b.toBytes)
    }
    assert(HevcKernels.hevcSpsDims(huge) == null)
    // a window that consumes the whole picture nulls (width <= 0)
    val eaten = {
      val b = new BitWriter
      b.u(0, 4); b.u(0, 3); b.u(1, 1)
      b.u(0, 2); b.u(0, 1); b.u(1, 5); b.u(0, 32); b.u(0, 4)
      b.u(0, 32); b.u(0, 12); b.u(120, 8)
      b.ue(0); b.ue(1)
      b.ue(16); b.ue(16)
      b.u(1, 1); b.ue(4); b.ue(4); b.ue(0); b.ue(0) // 2*(4+4) = 16
      b.ue(0); b.ue(0)
      b.stop()
      annexbNal(HevcKernels.SPS_NUT, b.toBytes)
    }
    assert(HevcKernels.hevcSpsDims(eaten) == null)
  }

  test("every generated slice exercises emulation prevention in both directions") {
    // the shared trailer plants 00 00 01 and 00 00 03 pre-EP: on the
    // wire each slice must carry at least two 0x03 escapes, and the
    // stripped rbsp_len must come back to the constant
    val es = HevcKernels.hevcEncode(2L, 1L) // Annex-B, 3 slices, TRAIL_R
    var escapes = 0
    for (i <- 2 until es.length)
      if (es(i) == 3 && es(i - 1) == 0 && es(i - 2) == 0) escapes += 1
    assert(escapes >= 2 * 3, s"expected >=6 EP escapes, saw $escapes")
    assert(HevcKernels.hevcStats(es).getLong(3) ==
      3L * HevcKernels.SliceRbspLen)
  }
}
