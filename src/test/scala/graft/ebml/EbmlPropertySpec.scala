package graft.ebml

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the EBML codec over generated inputs — the
  * fixture spec pins reference-observed layouts; these pin the codec
  * laws with an INDEPENDENT varint encoder written in the test, so an
  * encode/decode bug can't cancel itself out. */
class EbmlPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  /** Independent EBML size-varint encoder: marker bit in the leading
    * byte, big-endian value bits below it. */
  private def encodeSize(value: Long, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val marker = 0x80 >> (len - 1)
    val high = (value >> (8 * (len - 1))) & (marker - 1)
    out(0) = (marker | high).toByte
    var i = 1
    while (i < len) {
      out(i) = ((value >> (8 * (len - 1 - i))) & 0xff).toByte
      i += 1
    }
    out
  }

  test("readSize decodes any independently-encoded size varint") {
    val g = for {
      len <- Gen.chooseNum(1, 8)
      v <- Gen.chooseNum(0L, (1L << (7 * len)) - 2) // all-ones is the sentinel
    } yield (len, v)
    samples(g, 400).foreach { case (len, v) =>
      val (size, consumed) = Ebml.readSize(encodeSize(v, len), 0)
      assert(consumed == len, s"len $len value $v consumed $consumed")
      assert(size == v, s"len $len: decoded $size, wrote $v")
    }
    // the all-ones pattern of EVERY width is the unknown-size sentinel
    (1 to 8).foreach { len =>
      val (size, consumed) = Ebml.readSize(encodeSize((1L << (7 * len)) - 1, len), 0)
      assert(size == -1L && consumed == len, s"sentinel at len $len: $size")
    }
  }

  test("element() roundtrips arbitrary ids and payloads through readId/readSize") {
    // valid EBML ids carry their own length marker in the leading byte
    val idGen = Gen.oneOf(
      Gen.chooseNum(0x80L, 0xffL),
      Gen.chooseNum(0x4000L, 0x7fffL),
      Gen.chooseNum(0x200000L, 0x3fffffL),
      Gen.chooseNum(0x10000000L, 0x1fffffffL))
    val g = for {
      id <- idGen
      n <- Gen.chooseNum(0, 64)
      payload <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (id, payload.toArray)
    samples(g, 300).foreach { case (id, payload) =>
      val buf = Ebml.element(id, payload)
      val (gotId, idLen) = Ebml.readId(buf, 0)
      assert(gotId == id, f"id 0x$id%x decoded as 0x$gotId%x")
      assert(idLen == Ebml.idLen(id))
      val (size, szLen) = Ebml.readSize(buf, idLen)
      assert(size == payload.length.toLong)
      assert(buf.length == idLen + szLen + payload.length)
      assert(buf.drop(idLen + szLen).sameElements(payload))
    }
  }

  test("tags() recovers arbitrary tag name/value pairs from built fragments") {
    val token = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val g = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(token, token)))
    samples(g, 200).foreach { pairs =>
      // distinct names: EBML tag maps are last-wins on duplicates, which
      // the generator sidesteps to keep the expectation exact
      val distinct = pairs.toMap.toSeq
      val frag = Ebml.concat(distinct.map { case (n, v) => Ebml.simpleTag(n, v) }: _*)
      val got = Ebml.tags(frag)
      distinct.foreach { case (n, v) =>
        assert(got.get(n).contains(v), s"tag $n: ${got.get(n)} != $v")
      }
    }
  }

  test("laced blocks roundtrip arbitrary frame multisets in every lacing mode") {
    // frames of 0..600 bytes (crossing the Xiph 255-run boundary and the
    // 1-vs-2-byte EBML vint/svint widths), 1..8 frames per block; fixed
    // lacing constrains all frames to the first frame's length
    val frameGen = for {
      len <- Gen.frequency(
        3 -> Gen.chooseNum(0, 40),
        2 -> Gen.chooseNum(200, 310),   // straddles 255/256/510
        1 -> Gen.chooseNum(500, 600))
      seed <- Gen.chooseNum(0, 255)
    } yield Array.tabulate(len)(i => ((i * 131 + seed) & 0xff).toByte)
    val blockGen = for {
      n <- Gen.chooseNum(1, 8)
      frames <- Gen.listOfN(n, frameGen)
      mode <- Gen.oneOf(Ebml.LaceXiph, Ebml.LaceEbml, Ebml.LaceFixed)
    } yield (mode, frames)
    def payloadOf(block: Array[Byte]): Array[Byte] = {
      val (_, idLen) = Ebml.readId(block, 0)
      val (_, szLen) = Ebml.readSize(block, idLen)
      java.util.Arrays.copyOfRange(block, idLen + szLen, block.length)
    }
    samples(blockGen, 300).foreach { case (mode, raw) =>
      // fixed lacing requires equal frame sizes — conform the multiset
      val frames =
        if (mode == Ebml.LaceFixed)
          raw.map(f => java.util.Arrays.copyOf(raw.head, raw.head.length))
        else raw
      val back = Ebml.blockFrames(payloadOf(Ebml.simpleBlockLaced(frames, mode)))
      assert(back.length == frames.length, s"mode $mode count")
      frames.zip(back).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.util.Arrays.equals(a, b), s"mode $mode frame $i differs")
      }
    }
  }

  test("truncating a laced block at any byte throws EbmlException, never mis-slices or overruns") {
    val frames = Seq(
      Array.tabulate(300)(i => (i & 0xff).toByte),
      Array.tabulate(7)(i => (i * 3 & 0xff).toByte),
      Array.tabulate(260)(i => (i * 7 & 0xff).toByte))
    for (mode <- Seq(Ebml.LaceXiph, Ebml.LaceEbml)) {
      val block = Ebml.simpleBlockLaced(frames, mode)
      val (_, idLen) = Ebml.readId(block, 0)
      val (_, szLen) = Ebml.readSize(block, idLen)
      val payload = java.util.Arrays.copyOfRange(block, idLen + szLen, block.length)
      val whole = Ebml.blockFrames(payload)
      assert(whole.length == 3)
      // cuts INSIDE the last frame parse as a shorter implied-last frame
      // (format-inherent: the last size is the remainder), so the sweep
      // covers every cut up to the last frame's data start — header,
      // size table, declared frames — where the contract demands
      // EbmlException: no AIOOBE, no silent mis-slice
      (0 until payload.length - frames.last.length).foreach { cut =>
        try {
          Ebml.blockFrames(java.util.Arrays.copyOf(payload, cut))
          fail(s"mode $mode: truncation at $cut parsed successfully")
        } catch {
          case _: Ebml.EbmlException => () // the documented contract
        }
      }
    }
  }
}
