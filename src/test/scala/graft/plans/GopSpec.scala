package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** G22 GOP census: slice-header parse properties, pure JVM. The Spark
  * pipeline (mm_gop_census) is pinned by the closed-form DuckDB
  * oracle; these pin the kernel — the generator ladder arithmetic,
  * header variants the generator never writes (POC type 0, CABAC,
  * redundant-count PPS), and the out-of-subset null contract. */
class GopSpec extends AnyFunSuite {
  import NalKernels.BitWriter

  test("census matches the ladder arithmetic on every generator cell") {
    for (eventId <- 0L to 23L; userId <- 0L to 6L) {
      val g = GopKernels.gopCensus(GopKernels.h264GopEncode(eventId, userId))
      assert(g != null, s"event $eventId user $userId nulled")
      val m = (1 + eventId % 4).toInt
      assert(g.getLong(0) == 1 + m)
      assert(g.getLong(1) == 1)
      val nP = (1 to m).count(i => (i + userId) % 3 == 0)
      assert(g.getLong(2) == nP, s"n_p at event $eventId user $userId")
      assert(g.getLong(3) == m - nP)
      assert(g.getLong(4) == m)
    }
  }

  test("GOP stream stays consistent with the G17 census view of the same NALs") {
    // nal-level: SPS + PPS + (1+m) slices, IDR only on the anchor of
    // %4==0 events — the two layers must agree on slice counts
    for (eventId <- 0L to 11L) {
      val es = GopKernels.h264GopEncode(eventId, 3L)
      val st = NalKernels.nalStats(es)
      val g = GopKernels.gopCensus(es)
      assert(st.getLong(1) == 2 + g.getLong(0)) // n_nals = 2 + n_slices
      assert(st.getLong(2) == (if (eventId % 4 == 0) 1L else 0L))
    }
  }

  /** Minimal custom stream: SPS(cfg) + PPS(cfg) + one slice built by
    * `writeSlice`. */
  private def stream(spsTail: BitWriter => Unit, pps: Array[Byte],
      slice: Array[Byte]): Array[Byte] =
    NalKernels.assemble(0L, Seq( // even id -> Annex-B
      NalKernels.nal(0x67, spsRbsp(spsTail)),
      NalKernels.nal(0x68, pps),
      slice))

  /** SPS rbsp: baseline head, then caller-controlled fields from
    * log2_max_frame_num on (tail must complete the SPS). */
  private def spsRbsp(tail: BitWriter => Unit): Array[Byte] = {
    val w = new BitWriter
    w.u(66, 8); w.u(0, 8); w.u(30, 8)
    w.ue(0) // seq_parameter_set_id
    tail(w)
    w.stop()
    w.toBytes
  }

  private def basicSpsTail(pocType: Int)(w: BitWriter): Unit = {
    w.ue(1)       // log2_max_frame_num_minus4 -> u(5) frame_num
    w.ue(pocType)
    if (pocType == 0) w.ue(2) // log2_max_pic_order_cnt_lsb_minus4 -> u(6)
    w.ue(1); w.u(0, 1)
    w.ue(3); w.ue(3)
    w.u(1, 1); w.u(1, 1) // frame_mbs_only, direct_8x8
    w.u(0, 1)            // no cropping
    w.u(0, 1)            // no VUI
  }

  private def ppsRbsp(cabac: Boolean = false, bottomPoc: Boolean = false,
      redundant: Boolean = false): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0)
    w.u(if (cabac) 1 else 0, 1)
    w.u(if (bottomPoc) 1 else 0, 1)
    w.ue(0); w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 2)
    w.ue(0); w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 1)
    w.u(if (redundant) 1 else 0, 1)
    w.stop()
    w.toBytes
  }

  test("header variants beyond the generator: POC type 0, CABAC, redundant count") {
    // P slice under POC type 0 + bottom-field POC + CABAC + redundant:
    // header carries pic_order_cnt_lsb u(6), delta_bottom se,
    // redundant_pic_cnt ue, cabac_init_idc ue — all must be consumed
    // for frame_num to come out right
    val slice = {
      val w = new BitWriter
      w.ue(0); w.ue(0)  // first_mb, slice_type P
      w.ue(0)           // pps id
      w.u(17, 5)        // frame_num (5-bit width from the SPS tail)
      w.u(33, 6)        // pic_order_cnt_lsb
      w.ue(4)           // delta_pic_order_cnt_bottom (se -> ue bits)
      w.ue(2)           // redundant_pic_cnt
      w.u(0, 1)         // num_ref_idx_active_override
      w.u(0, 1)         // ref_pic_list_modification_flag_l0
      w.u(0, 1)         // adaptive_ref_pic_marking (ref_idc != 0)
      w.ue(1)           // cabac_init_idc
      w.ue(0)           // slice_qp_delta
      w.stop()
      NalKernels.nal(0x41, w.toBytes)
    }
    val g = GopKernels.gopCensus(stream(basicSpsTail(0),
      ppsRbsp(cabac = true, bottomPoc = true, redundant = true), slice))
    assert(g != null && g.getLong(0) == 1 && g.getLong(2) == 1 &&
      g.getLong(4) == 17)
  }

  test("out-of-subset configurations null, never misparse") {
    def islice(body: BitWriter => Unit): Array[Byte] = {
      val w = new BitWriter
      w.ue(0); w.ue(2); w.ue(0) // I slice
      w.u(0, 5)                 // frame_num
      body(w)
      w.stop()
      NalKernels.nal(0x41, w.toBytes)
    }
    // slice-group PPS (num_slice_groups_minus1 > 0)
    val sgPps = {
      val w = new BitWriter
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1)
      w.ue(1) // one extra slice group -> map follows -> out of scope
      w.stop(); w.toBytes
    }
    assert(GopKernels.gopCensus(stream(basicSpsTail(2), sgPps,
      islice(w => { w.u(0, 1); w.ue(0) }))) == null)
    // slices ahead of their parameter sets
    val noPs = NalKernels.assemble(0L, Seq(islice(w => {
      w.u(0, 1); w.ue(0)
    })))
    assert(GopKernels.gopCensus(noPs) == null)
    // adaptive ref-pic marking on a non-IDR reference slice
    val adaptive = islice(w => { w.u(1, 1); w.ue(0) })
    assert(GopKernels.gopCensus(
      stream(basicSpsTail(2), ppsRbsp(), adaptive)) == null)
    // truncated header: reader runs dry inside frame_num
    val short = NalKernels.nal(0x41, {
      val w = new BitWriter; w.ue(0); w.ue(2); w.toBytes
    })
    assert(GopKernels.gopCensus(
      stream(basicSpsTail(2), ppsRbsp(), short)) == null)
    // unparseable container
    assert(GopKernels.gopCensus(Array[Byte](1, 2, 3)) == null)
    assert(GopKernels.gopCensus(null) == null)
  }
}
