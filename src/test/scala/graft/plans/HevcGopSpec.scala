package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** G25 HEVC GOP census: slice-segment-header parse properties, pure
  * JVM. The Spark pipeline (mm_hevc_gop_census) is pinned by the
  * closed-form DuckDB oracle; these pin the kernel — the generator
  * ladder arithmetic, agreement with the G19 NAL-level view, header
  * variants the generator never writes (override + collocated ref
  * idx, output flag, extra header bits, SPS-indexed RPS), and the
  * out-of-subset null contract. */
class HevcGopSpec extends AnyFunSuite {
  import NalKernels.BitWriter

  test("census matches the ladder arithmetic on every generator cell") {
    for (eventId <- 0L to 23L; userId <- 0L to 6L) {
      val g = HevcGopKernels.hevcGopCensus(
        HevcGopKernels.hevcGopEncode(eventId, userId))
      assert(g != null, s"event $eventId user $userId nulled")
      val m = (1 + eventId % 4).toInt
      assert(g.getLong(0) == 1 + m)
      assert(g.getLong(1) == 1)
      val nP = (1 to m).count(i => (i + userId) % 3 == 0)
      assert(g.getLong(2) == nP, s"n_p at event $eventId user $userId")
      assert(g.getLong(3) == m - nP)
      assert(g.getLong(4) == m, s"max_poc_lsb at event $eventId")
    }
  }

  test("GOP stream stays consistent with the G19 census view of the same NALs") {
    // nal-level: VPS + SPS + PPS + (1+m) slices; the anchor is ALWAYS
    // an IRAP in HEVC (IDR on %4==0 events, CRA otherwise) — the NAL
    // census sees exactly one random-access point per event
    for (eventId <- 0L to 11L) {
      val es = HevcGopKernels.hevcGopEncode(eventId, 3L)
      val st = HevcKernels.hevcStats(es)
      val g = HevcGopKernels.hevcGopCensus(es)
      assert(st.getLong(1) == 3 + g.getLong(0)) // n_nals = 3 + n_slices
      assert(st.getLong(2) == 1L, s"anchor of event $eventId is IRAP")
    }
  }

  // ---- custom-stream helpers (fields the generator never writes) -------

  private def ptl(w: BitWriter): Unit = {
    w.u(0, 2); w.u(0, 1); w.u(1, 5)
    w.u(1 << 30, 32)
    w.u(1, 1); w.u(0, 1); w.u(0, 1); w.u(1, 1)
    w.u(0, 32); w.u(0, 12)
    w.u(60, 8)
  }

  /** Tweakable SPS: 64×64, 8-bit POC lsb, CTB 64 (one CTB per pic). */
  private def spsRbsp(numStRps: Int = 0, longTerm: Boolean = false,
      tmvp: Boolean = true, sao: Boolean = true): Array[Byte] = {
    val w = new BitWriter
    w.u(0, 4); w.u(0, 3); w.u(1, 1)
    ptl(w)
    w.ue(0)        // sps id
    w.ue(1)        // chroma 4:2:0
    w.ue(64); w.ue(64)
    w.u(0, 1)      // no conformance window
    w.ue(0); w.ue(0)
    w.ue(4)        // log2_max_pic_order_cnt_lsb_minus4 -> u(8)
    w.u(0, 1)      // no per-sub-layer ordering
    w.ue(1); w.ue(0); w.ue(0)
    w.ue(0); w.ue(3)        // CTB = 64
    w.ue(0); w.ue(3)
    w.ue(0); w.ue(0)
    w.u(0, 1)      // scaling lists off
    w.u(1, 1)      // amp
    w.u(if (sao) 1 else 0, 1)
    w.u(0, 1)      // pcm off
    w.ue(numStRps)
    var i = 0
    while (i < numStRps) {
      if (i > 0) w.u(0, 1)  // inter_ref_pic_set_prediction_flag
      w.ue(1); w.ue(0)      // one negative pic
      w.ue(0); w.u(1, 1)
      i += 1
    }
    w.u(if (longTerm) 1 else 0, 1)
    if (longTerm) w.ue(0)   // empty long-term SPS list
    w.u(if (tmvp) 1 else 0, 1)
    w.u(1, 1)      // strong intra smoothing
    w.u(0, 1)      // no VUI
    w.u(0, 1)      // no extension
    w.stop()
    w.toBytes
  }

  private def ppsRbsp(dependent: Boolean = false, outputFlag: Boolean = false,
      extraBits: Int = 0, cabacInit: Boolean = false,
      l0Default: Int = 0, weightedPred: Boolean = false,
      listsMod: Boolean = false, tiles: Boolean = false): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0)
    w.u(if (dependent) 1 else 0, 1)
    w.u(if (outputFlag) 1 else 0, 1)
    w.u(extraBits, 3)
    w.u(0, 1)
    w.u(if (cabacInit) 1 else 0, 1)
    w.ue(l0Default); w.ue(0)
    w.ue(0)        // init_qp se(0)
    w.u(0, 1); w.u(0, 1)
    w.u(0, 1)      // no cu_qp_delta
    w.ue(0); w.ue(0)
    w.u(0, 1)
    w.u(if (weightedPred) 1 else 0, 1); w.u(0, 1)
    w.u(0, 1)
    w.u(if (tiles) 1 else 0, 1); w.u(0, 1)
    // (a tiles=1 PPS is out of subset; parser must bail before here)
    w.u(1, 1)      // loop filter across slices
    w.u(0, 1)      // no deblocking control
    w.u(0, 1)      // no pps scaling list
    w.u(if (listsMod) 1 else 0, 1)
    w.ue(0)
    w.u(0, 1)      // no header extension
    w.u(0, 1)      // no pps extension
    w.stop()
    w.toBytes
  }

  private def stream(sps: Array[Byte], pps: Array[Byte],
      slices: Array[Byte]*): Array[Byte] =
    HevcKernels.assembleHevc(0L, // even id -> Annex-B
      HevcKernels.nal(HevcKernels.SPS_NUT, sps) +:
        HevcKernels.nal(HevcKernels.PPS_NUT, pps) +: slices)

  test("header variants beyond the generator: override + collocated, output flag, extra bits, SPS-indexed RPS") {
    // P slice (TRAIL_R) under: 2 extra header bits, output flag,
    // cabac-init PPS, SPS-indexed RPS (2 sets -> 1 idx bit), tmvp ON
    // with num_ref_idx override -> collocated_ref_idx present
    val slice = {
      val w = new BitWriter
      w.u(1, 1)      // first_slice_segment_in_pic_flag
      w.ue(0)        // pps id
      w.u(0, 2)      // the 2 extra slice header bits
      w.ue(1)        // slice_type P
      w.u(1, 1)      // pic_output_flag
      w.u(77, 8)     // slice_pic_order_cnt_lsb
      w.u(1, 1)      // short_term_ref_pic_set_sps_flag -> indexed
      w.u(1, 1)      // short_term_ref_pic_set_idx (2 sets -> 1 bit)
      w.u(1, 1)      // slice_temporal_mvp_enabled_flag
      w.u(1, 1); w.u(0, 1) // sao luma / chroma
      w.u(1, 1)      // num_ref_idx_active_override_flag
      w.ue(2)        // num_ref_idx_l0_active_minus1 = 2
      w.u(1, 1)      // cabac_init_flag
      w.ue(1)        // collocated_ref_idx (fromL0 default, nl0 > 0)
      w.ue(0)        // five_minus_max_num_merge_cand
      w.ue(0)        // slice_qp_delta
      w.stop()
      HevcKernels.nal(HevcKernels.TRAIL_R, w.toBytes)
    }
    val g = HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(numStRps = 2), ppsRbsp(outputFlag = true, extraBits = 2,
        cabacInit = true), slice))
    assert(g != null && g.getLong(0) == 1 && g.getLong(2) == 1 &&
      g.getLong(4) == 77, s"got $g")
  }

  test("out-of-subset configurations null, never misparse") {
    def islice(): Array[Byte] = {
      val w = new BitWriter
      w.u(1, 1)      // first_slice_segment_in_pic_flag
      w.u(0, 1)      // no_output_of_prior_pics_flag (CRA is IRAP)
      w.ue(0)        // pps id
      w.ue(2)        // slice_type I
      w.u(0, 8)      // poc
      w.u(0, 1)      // explicit rps
      w.ue(0); w.ue(0)
      w.u(0, 1)      // tmvp off
      w.u(0, 1); w.u(0, 1) // sao
      w.ue(0)        // qp delta
      w.stop()
      HevcKernels.nal(HevcGopKernels.CRA_NUT, w.toBytes)
    }
    def pslice(listsTrigger: Boolean = false): Array[Byte] = {
      val w = new BitWriter
      w.u(1, 1); w.ue(0); w.ue(1)
      w.u(1, 8)
      w.u(0, 1); w.ue(1); w.ue(0); w.ue(0); w.u(1, 1)
      w.u(0, 1)      // tmvp off
      w.u(0, 1); w.u(0, 1)
      w.u(0, 1)      // no override
      w.ue(0)        // merge cand
      w.ue(0)        // qp
      w.stop()
      HevcKernels.nal(HevcKernels.TRAIL_R, w.toBytes)
    }
    // dependent slice (non-first segment under a dependent-enabled PPS)
    val dep = {
      val w = new BitWriter
      w.u(0, 1)      // NOT first in pic
      w.ue(0)
      w.u(1, 1)      // dependent_slice_segment_flag
      w.stop()
      HevcKernels.nal(HevcKernels.TRAIL_R, w.toBytes)
    }
    assert(HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(), ppsRbsp(dependent = true), dep)) == null)
    // long-term refs in the SPS
    assert(HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(longTerm = true), ppsRbsp(), islice())) == null)
    // tiles PPS
    assert(HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(), ppsRbsp(tiles = true), islice())) == null)
    // list modification on a P slice
    assert(HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(), ppsRbsp(listsMod = true), pslice())) == null)
    // weighted prediction on a P slice
    assert(HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(), ppsRbsp(weightedPred = true), pslice())) == null)
    // slices ahead of their parameter sets
    assert(HevcGopKernels.hevcGopCensus(
      HevcKernels.assembleHevc(0L, Seq(islice()))) == null)
    // truncated header: reader runs dry inside the RPS walk
    val short = HevcKernels.nal(HevcKernels.TRAIL_R, {
      val w = new BitWriter
      w.u(1, 1); w.ue(0); w.ue(1); w.u(1, 8)
      w.toBytes
    })
    assert(HevcGopKernels.hevcGopCensus(stream(
      spsRbsp(), ppsRbsp(), short)) == null)
    // unparseable container / null
    assert(HevcGopKernels.hevcGopCensus(Array[Byte](1, 2, 3)) == null)
    assert(HevcGopKernels.hevcGopCensus(null) == null)
  }
}
