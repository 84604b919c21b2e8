package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Out-of-band codec configuration (G21/G23): avcC and AAC-ASC kernel
  * properties plus the Tracks/CodecPrivate container plumbing. The
  * Spark pipelines (mm_avcc_sps / mm_aac_asc) are pinned by the DuckDB
  * ramp oracles; these pin the kernels and the fixture's defining
  * property — parameter sets travel ONLY in the container. */
class CodecPrivateSpec extends AnyFunSuite {
  import graft.ebml.EbmlFunctions

  test("avcC round-trips the G18 SPS arithmetic for every generator cell") {
    for (eventId <- 0L to 15L; userId <- 0L to 7L) {
      val d = CodecPrivateKernels.avccSpsDims(
        CodecPrivateKernels.avccEncode(eventId, userId))
      assert(d != null)
      assert(d.getLong(0) == 66 + 11 * (userId % 2))
      assert(d.getLong(1) == 10 * (1 + eventId % 4))
      assert(d.getLong(2) == 16 * (4 + userId % 4) - 2 * (eventId % 2))
      assert(d.getLong(3) == 16 * (4 + eventId % 4) - 2 * (userId % 2))
    }
  }

  test("the G21 fixture's in-band stream carries NO parameter sets (the judge's done condition)") {
    for (eventId <- 0L to 11L; userId <- Seq(0L, 3L)) {
      val es = NalKernels.h264EncodeSlices(eventId, userId)
      // in-band SPS parse must find nothing …
      assert(NalKernels.spsDims(es) == null)
      // … while the stream itself stays a valid slices-only census
      val st = NalKernels.nalStats(es)
      assert(st != null && st.getLong(1) == 1 + eventId % 3)
      val units = NalKernels.nalUnits(es)
      for (i <- 0 until units.numElements) {
        val tpe = units.getStruct(i, 3).getLong(0)
        assert(tpe == 1L || tpe == 5L, s"non-slice NAL $tpe in-band")
      }
    }
  }

  test("malformed avcC blobs return null, never throw") {
    val good = CodecPrivateKernels.avccEncode(2L, 3L)
    assert(CodecPrivateKernels.avccSpsDims(null) == null)
    assert(CodecPrivateKernels.avccSpsDims(Array[Byte](1, 2)) == null)
    // wrong configurationVersion
    val badVer = good.clone(); badVer(0) = 2
    assert(CodecPrivateKernels.avccSpsDims(badVer) == null)
    // zero SPS entries
    val noSps = good.clone(); noSps(5) = 0xe0.toByte
    assert(CodecPrivateKernels.avccSpsDims(noSps) == null)
    // SPS length overruns the blob
    val overrun = good.clone(); overrun(6) = 0x7f
    assert(CodecPrivateKernels.avccSpsDims(overrun) == null)
    // a non-SPS NAL in the SPS slot
    val notSps = good.clone(); notSps(8) = 0x68
    assert(CodecPrivateKernels.avccSpsDims(notSps) == null)
    // truncated to mid-header
    assert(CodecPrivateKernels.avccSpsDims(
      java.util.Arrays.copyOf(good, 7)) == null)
  }

  test("AAC ASC decodes every generator cell and the spec's escape branches") {
    for (eventId <- 0L to 25L; userId <- 0L to 5L) {
      val asc = CodecPrivateKernels.aacAscEncode(eventId, userId)
      assert(asc.length == 2)
      val r = CodecPrivateKernels.aacAsc(asc)
      assert(r != null)
      assert(r.getLong(0) == 2 + userId % 3)
      assert(r.getLong(1) ==
        CodecPrivateKernels.AacRates((eventId % 13).toInt))
      assert(r.getLong(2) == 1 + eventId % 2)
    }
    // objectType 31-escape: value = 32 + u(6)
    val esc = {
      val w = new NalKernels.BitWriter
      w.u(31, 5); w.u(10, 6) // -> objectType 42 (USAC)
      w.u(3, 4); w.u(2, 4); w.u(0, 5) // pad to a byte boundary
      w.toBytes
    }
    val rEsc = CodecPrivateKernels.aacAsc(esc)
    assert(rEsc != null && rEsc.getLong(0) == 42 && rEsc.getLong(1) == 48000
      && rEsc.getLong(2) == 2)
    // freqIndex 15: explicit 24-bit rate follows
    val explicit = {
      val w = new NalKernels.BitWriter
      w.u(2, 5); w.u(15, 4); w.u(37800, 24); w.u(1, 4); w.u(0, 3)
      w.toBytes
    }
    val rExp = CodecPrivateKernels.aacAsc(explicit)
    assert(rExp != null && rExp.getLong(1) == 37800 && rExp.getLong(2) == 1)
    // reserved indices 13/14 -> null
    for (idx <- Seq(13, 14)) {
      val w = new NalKernels.BitWriter
      w.u(2, 5); w.u(idx, 4); w.u(1, 4); w.u(0, 3)
      assert(CodecPrivateKernels.aacAsc(w.toBytes) == null, s"idx $idx")
    }
    // truncated: the explicit-rate read runs past the end
    val short = {
      val w = new NalKernels.BitWriter
      w.u(2, 5); w.u(15, 4); w.u(0, 7)
      w.toBytes
    }
    assert(CodecPrivateKernels.aacAsc(short) == null)
    assert(CodecPrivateKernels.aacAsc(Array[Byte](1)) == null)
  }

  test("avcC->Annex-B conversion: params land in-band, census and dims survive byte-exact") {
    for (eventId <- 0L to 11L; userId <- Seq(0L, 3L, 6L)) {
      val stream = NalKernels.h264EncodeSlices(eventId, userId)
      val avcc = CodecPrivateKernels.avccEncode(eventId, userId)
      val es = CodecPrivateKernels.avccToAnnexb(stream, avcc)
      assert(es != null)
      // the converted stream must equal the FULL in-band encoder's
      // Annex-B output byte-for-byte on even events (same NAL order,
      // same start-code pattern) — the strongest possible pin
      if (eventId % 2 == 0)
        assert(es.toSeq == NalKernels.h264Encode(eventId, userId).toSeq,
          s"conversion diverged from the in-band encoder at event $eventId")
      // …and on odd (AVCC-framed) inputs the readers verify it
      val st = NalKernels.nalStats(es)
      assert(st.getUTF8String(0).toString == "annexb")
      assert(st.getLong(1) == 3 + eventId % 3)
      val d = NalKernels.spsDims(es)
      assert(d != null && d.getLong(0) == 66 + 11 * (userId % 2))
    }
    // malformed inputs: null, never throw
    val goodStream = NalKernels.h264EncodeSlices(1L, 1L)
    val goodAvcc = CodecPrivateKernels.avccEncode(1L, 1L)
    assert(CodecPrivateKernels.avccToAnnexb(goodStream, Array[Byte](1)) == null)
    assert(CodecPrivateKernels.avccToAnnexb(Array[Byte](1, 2), goodAvcc) == null)
    // an avcC truncated after its SPS (no PPS) is malformed now that
    // the shared walk requires both parameter sets
    val spsLen = ((goodAvcc(6) & 0xff) << 8) | (goodAvcc(7) & 0xff)
    assert(CodecPrivateKernels.avccToAnnexb(goodStream,
      java.util.Arrays.copyOf(goodAvcc, 8 + spsLen)) == null)
  }

  test("avcC lengthSizeMinusOne drives the non-Annex-B range walk (spec-legal 2-byte prefixes)") {
    val avcc4 = CodecPrivateKernels.avccEncode(1L, 1L)
    val es4 = NalKernels.h264EncodeSlices(1L, 1L) // odd event: 4-byte AVCC framing
    val ref = CodecPrivateKernels.avccToAnnexb(es4, avcc4)
    assert(ref != null)
    // re-frame the same NALs behind 2-byte length prefixes and declare
    // lengthSizeMinusOne = 1 in the avcC — the conversion must read the
    // declared width and produce the IDENTICAL Annex-B stream
    val out = new java.io.ByteArrayOutputStream()
    NalKernels.nalRanges(es4).foreach { case (s, e) =>
      val len = e - s
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      out.write(es4, s, len)
    }
    val es2 = out.toByteArray
    val avcc2 = avcc4.clone(); avcc2(4) = (0xfc | 1).toByte
    val conv2 = CodecPrivateKernels.avccToAnnexb(es2, avcc2)
    assert(conv2 != null && java.util.Arrays.equals(conv2, ref),
      "2-byte-prefixed input must convert byte-identically to the 4-byte form")
    // width mismatches misparse to NULL, never to garbage ranges:
    // a 4-byte stream declared 2-byte reads a zero length; a 2-byte
    // stream declared 4-byte reads an overrunning one
    assert(CodecPrivateKernels.avccToAnnexb(es4, avcc2) == null)
    assert(CodecPrivateKernels.avccToAnnexb(es2, avcc4) == null)
    // DECLARED width beats content sniffing: a spec-legal 4-byte
    // length-prefixed stream whose FIRST NAL is 256-511 bytes long
    // starts 00 00 01 xx — byte-ambiguous with an Annex-B start code.
    // The conversion must walk it at the declared width, not hand the
    // bytes to the start-code scan (which would absorb later prefixes
    // into payloads)
    val nal1 = new Array[Byte](300); nal1(0) = 0x41; nal1(1) = 0x55
    val nal2 = new Array[Byte](20); nal2(0) = 0x41; nal2(1) = 0x66
    val amb = new java.io.ByteArrayOutputStream()
    for (n <- Seq(nal1, nal2)) {
      amb.write(0); amb.write(0)
      amb.write((n.length >>> 8) & 0xff); amb.write(n.length & 0xff)
      amb.write(n, 0, n.length)
    }
    val ambBytes = amb.toByteArray
    assert(NalKernels.isAnnexB(ambBytes), "fixture must be byte-ambiguous")
    val conv = CodecPrivateKernels.avccToAnnexb(ambBytes, avcc4)
    assert(conv != null)
    val units = NalKernels.nalUnits(conv)
    // SPS + PPS re-muxed in-band + the TWO payload NALs, boundaries
    // exactly as declared — a sniff-first walk would not see 4 NALs
    assert(units.numElements == 4, s"saw ${units.numElements} NALs")
  }

  test("hvcC->Annex-B conversion: VPS/SPS/PPS land in-band, census and dims survive byte-exact") {
    for (eventId <- 0L to 11L; userId <- Seq(0L, 3L, 6L)) {
      val stream = HevcKernels.hevcEncodeSlices(eventId, userId)
      val hvcc = CodecPrivateKernels.hvccEncode(eventId, userId)
      val es = CodecPrivateKernels.hvccToAnnexb(stream, hvcc)
      assert(es != null)
      // the converted stream must equal the FULL in-band encoder's
      // Annex-B output byte-for-byte on even events (same NAL order,
      // same start-code pattern) — the G21c strongest-pin rule
      if (eventId % 2 == 0)
        assert(es.toSeq == HevcKernels.hevcEncode(eventId, userId).toSeq,
          s"conversion diverged from the in-band encoder at event $eventId")
      // …and on odd (hvcC-framed) inputs the readers verify it
      val st = HevcKernels.hevcStats(es)
      assert(st.getUTF8String(0).toString == "annexb")
      assert(st.getLong(1) == 4 + eventId % 3)
      assert(st.getLong(3) == 16 * (1 + eventId % 3))
      val d = HevcKernels.hevcSpsDims(es)
      assert(d != null && d.getLong(0) == 1 + userId % 2)
    }
    // declared length-prefix width is honored: re-frame the same NALs
    // behind 2-byte lengths and flip lengthSizeMinusOne to 1
    val stream4 = HevcKernels.hevcEncodeSlices(1L, 1L)
    val hvcc4 = CodecPrivateKernels.hvccEncode(1L, 1L)
    val ref = CodecPrivateKernels.hvccToAnnexb(stream4, hvcc4)
    val out = new java.io.ByteArrayOutputStream()
    NalKernels.nalRanges(stream4).foreach { case (s, e) =>
      val len = e - s
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      out.write(stream4, s, len)
    }
    val stream2 = out.toByteArray
    val hvcc2 = hvcc4.clone()
    hvcc2(21) = ((hvcc2(21) & 0xfc) | 1).toByte
    val conv2 = CodecPrivateKernels.hvccToAnnexb(stream2, hvcc2)
    assert(conv2 != null && java.util.Arrays.equals(conv2, ref))
    assert(CodecPrivateKernels.hvccToAnnexb(stream4, hvcc2) == null)
    // malformed inputs: null, never throw
    assert(CodecPrivateKernels.hvccToAnnexb(stream4, Array[Byte](1)) == null)
    assert(CodecPrivateKernels.hvccToAnnexb(Array[Byte](1, 2), hvcc4) == null)
    // an hvcC whose PPS array is truncated away is malformed (the walk
    // requires SPS and PPS): cut right before the last array
    val ppsArrStart = {
      // arrays: 3-byte head + 2-byte len + nal, ×3 — find the third
      var p = 23
      var a = 0
      while (a < 2) {
        val num = ((hvcc4(p + 1) & 0xff) << 8) | (hvcc4(p + 2) & 0xff)
        p += 3
        var n = 0
        while (n < num) {
          val len = ((hvcc4(p) & 0xff) << 8) | (hvcc4(p + 1) & 0xff)
          p += 2 + len
          n += 1
        }
        a += 1
      }
      p
    }
    assert(CodecPrivateKernels.hvccToAnnexb(stream4,
      java.util.Arrays.copyOf(hvcc4, ppsArrStart)) == null)
  }

  test("ASC->ADTS mux: header round-trips every generator cell; out-of-range configs null") {
    val frame = AudioKernels.wavEncode(3L, silent = false)
    for (eventId <- 0L to 25L; userId <- 0L to 5L) {
      val asc = CodecPrivateKernels.aacAscEncode(eventId, userId)
      val adts = CodecPrivateKernels.ascToAdts(asc, frame)
      assert(adts != null && adts.length == 7 + frame.length)
      // payload is byte-preserved behind the 7-byte header
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(adts, 7, adts.length), frame))
      val p = CodecPrivateKernels.adtsParse(adts)
      assert(p != null)
      assert(p.getLong(0) == 2 + userId % 3, "object_type")
      assert(p.getLong(1) ==
        CodecPrivateKernels.AacRates((eventId % 13).toInt), "sample_rate")
      assert(p.getLong(2) == 1 + eventId % 2, "channels")
      assert(p.getLong(3) == 7 + frame.length, "frame_length")
      assert(p.getLong(4) == frame.length, "payload_bytes")
    }
    // out-of-range configs: escaped object type (ADTS profile is 2
    // bits), explicit 24-bit rate (index 15), reserved indexes, big
    // payloads past the 13-bit length, truncation
    def asc(ot: Int, fi: Int, ch: Int): Array[Byte] = {
      val w = new NalKernels.BitWriter
      w.u(ot, 5); w.u(fi, 4); w.u(ch, 4); w.u(0, 3)
      w.toBytes
    }
    assert(CodecPrivateKernels.ascToAdts(asc(5, 3, 2), frame) == null)
    assert(CodecPrivateKernels.ascToAdts(asc(31, 3, 2), frame) == null)
    assert(CodecPrivateKernels.ascToAdts(asc(2, 13, 2), frame) == null)
    assert(CodecPrivateKernels.ascToAdts(asc(2, 15, 2), frame) == null)
    assert(CodecPrivateKernels.ascToAdts(asc(2, 3, 0), frame) == null)
    assert(CodecPrivateKernels.ascToAdts(asc(2, 3, 2),
      new Array[Byte](8185)) == null)
    assert(CodecPrivateKernels.ascToAdts(Array[Byte](1), frame) == null)
    assert(CodecPrivateKernels.ascToAdts(null, frame) == null)
    assert(CodecPrivateKernels.ascToAdts(asc(2, 3, 2), null) == null)
    // parse guards: bad sync, bad layer, length overrunning the buffer
    val good = CodecPrivateKernels.ascToAdts(asc(2, 3, 2), frame)
    val badSync = good.clone(); badSync(0) = 0x12
    assert(CodecPrivateKernels.adtsParse(badSync) == null)
    val badLayer = good.clone()
    badLayer(1) = (badLayer(1) | 0x06).toByte
    assert(CodecPrivateKernels.adtsParse(badLayer) == null)
    assert(CodecPrivateKernels.adtsParse(
      java.util.Arrays.copyOf(good, 20)) == null)
    assert(CodecPrivateKernels.adtsParse(null) == null)
  }

  test("hvcC round-trips the G20 SPS arithmetic; array walk skips VPS to the SPS array") {
    for (eventId <- 0L to 15L; userId <- 0L to 7L) {
      val d = CodecPrivateKernels.hvccSpsDims(
        CodecPrivateKernels.hvccEncode(eventId, userId))
      assert(d != null)
      assert(d.getLong(0) == 1 + userId % 2)
      assert(d.getLong(1) == 60 + 30 * (eventId % 4))
      assert(d.getLong(2) == 8 * (8 + userId % 4) - 2 * (eventId % 2))
      assert(d.getLong(3) == 8 * (8 + eventId % 4) - 2 * (userId % 2))
    }
    // the hvcC fixed head mirrors the SPS's PTL (an ISO 14496-15
    // consistency requirement): byte 1 = profile, byte 12 = level
    val blob = CodecPrivateKernels.hvccEncode(3L, 1L)
    assert((blob(1) & 0xff) == 2 && (blob(12) & 0xff) == 150)
  }

  test("the hvcC fixture's in-band HEVC stream carries NO parameter sets") {
    for (eventId <- 0L to 11L; userId <- Seq(0L, 5L)) {
      val es = HevcKernels.hevcEncodeSlices(eventId, userId)
      assert(HevcKernels.hevcSpsDims(es) == null)
      val st = HevcKernels.hevcStats(es)
      assert(st != null && st.getLong(1) == 1 + eventId % 3)
    }
  }

  test("malformed hvcC blobs return null, never throw") {
    val good = CodecPrivateKernels.hvccEncode(2L, 3L)
    assert(CodecPrivateKernels.hvccSpsDims(null) == null)
    assert(CodecPrivateKernels.hvccSpsDims(
      java.util.Arrays.copyOf(good, 23)) == null)
    // wrong configurationVersion
    val badVer = good.clone(); badVer(0) = 0
    assert(CodecPrivateKernels.hvccSpsDims(badVer) == null)
    // zero arrays -> no SPS
    val noArrays = java.util.Arrays.copyOf(good, 24)
    noArrays(22) = 0
    assert(CodecPrivateKernels.hvccSpsDims(noArrays) == null)
    // a NAL length overrunning the blob
    val overrun = good.clone(); overrun(26) = 0x7f
    assert(CodecPrivateKernels.hvccSpsDims(overrun) == null)
    // a non-SPS NAL planted in the SPS array slot: find the SPS array
    // (type byte 0x80|33 after the VPS array) and corrupt its NAL header
    val vpsLen = ((good(26) & 0xff) << 8) | (good(27) & 0xff)
    val spsArray = 28 + vpsLen
    assert((good(spsArray) & 0x3f) == 33)
    val wrongNal = good.clone(); wrongNal(spsArray + 5) = 0x40 // VPS header
    assert(CodecPrivateKernels.hvccSpsDims(wrongNal) == null)
  }

  test("Tracks/CodecPrivate container plumbing: write, walk back, coexist with tags and block") {
    val cp = CodecPrivateKernels.avccEncode(5L, 2L)
    val frame = NalKernels.h264EncodeSlices(5L, 2L)
    val blob = EbmlFunctions.buildFragmentTrack(
      5L, 12345L, 2L, 700L, "V_MPEG4/ISO/AVC", cp, frame)
    val trk = graft.ebml.EbmlKernels.trackInfo(blob)
    assert(trk != null)
    assert(trk.getUTF8String(0).toString == "V_MPEG4/ISO/AVC")
    assert(trk.getBinary(1).toSeq == cp.toSeq)
    // the out-of-band dims parse straight off the walked bytes
    val d = CodecPrivateKernels.avccSpsDims(trk.getBinary(1))
    assert(d != null && d.getLong(0) == 66)
    // tags and the media block survive the Tracks insertion untouched
    val tags = graft.ebml.Ebml.tags(blob)
    assert(tags(EbmlFunctions.FragmentNumber) == "5")
    assert(tags(EbmlFunctions.UserIdTag) == "2")
    assert(graft.ebml.EbmlKernels.firstBlock(blob).toSeq == frame.toSeq)
    // the A_ namespace flips TrackType to audio (2); verify via walk
    val audio = EbmlFunctions.buildFragmentTrack(
      1L, 1L, 1L, 1L, "A_AAC", CodecPrivateKernels.aacAscEncode(1L, 1L),
      Array[Byte](9))
    val tt = graft.ebml.Ebml.elements(audio, Set("TrackType"))
    assert(tt.nonEmpty && tt.head.longValue == 2L)
    val video = graft.ebml.Ebml.elements(blob, Set("TrackType"))
    assert(video.nonEmpty && video.head.longValue == 1L)
    // a track-less fragment (the plain frame form) walks to null
    val plain = EbmlFunctions.buildFragmentFrame(1L, 1L, 1L, 1L, frame)
    assert(graft.ebml.EbmlKernels.trackInfo(plain) == null)
  }
}
