package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Hashing

/** The toy BMP codec (G2): encoder/decoder kernel properties, pure JVM.
  * The Spark-side pipeline (mm_features_bmp / mm_frame_dedup) is pinned
  * by the DuckDB oracle; these pin the kernels themselves, including on
  * inputs the generator never produces. */
class ImageSpec extends AnyFunSuite {

  private def meanMilliOf(bits: Long): Long = {
    // closed form: pixel_sum = 72*128 + sum_i (8 - i%8) * (2*b_i - 1)
    var adj = 0L
    for (i <- 0 until 64) {
      val b = (bits >>> i) & 1L
      adj += (8 - (i % 8)) * (2 * b - 1)
    }
    (9216L + adj) * 1000L / 72L
  }

  test("encode->decode recovers dhash losslessly and the closed-form mean") {
    val patterns = Seq(0L, -1L, Long.MaxValue, Long.MinValue,
      0x5555555555555555L, 0xAAAAAAAAAAAAAAAAL) ++
      (1 to 50).map(i => Hashing.mix64(i.toLong))
    for (d <- patterns) {
      val row = ImageKernels.bmpFeatures(ImageKernels.bmpEncode(d))
      assert(row != null, s"decode failed for pattern $d")
      assert(row.getLong(0) == 9 && row.getLong(1) == 8)
      assert(row.getLong(3) == d, s"dhash mismatch for pattern $d")
      assert(row.getLong(2) == meanMilliOf(d), s"mean mismatch for pattern $d")
    }
  }

  test("decoder is a generic 24-bit parser: hand-built 2x2 image, padding and bottom-up rows") {
    // 2x2 image, stride = ((2*3+3)/4)*4 = 8 (2 pad bytes per row).
    // Top row lumas (10, 20), bottom row (30, 5) -> stored bottom-first.
    val stride = 8
    val buf = new Array[Byte](54 + stride * 2)
    def le32(off: Int, v: Int): Unit = for (j <- 0 until 4)
      buf(off + j) = ((v >>> (8 * j)) & 0xff).toByte
    buf(0) = 'B'; buf(1) = 'M'; le32(10, 54); le32(14, 40)
    le32(18, 2); le32(22, 2); buf(26) = 1; buf(28) = 24
    def px(off: Int, v: Int): Unit = { buf(off) = v.toByte; buf(off + 1) = v.toByte; buf(off + 2) = v.toByte }
    px(54, 30); px(57, 5)    // stored first = bottom = visual row 1
    px(62, 10); px(65, 20)   // stored second = top = visual row 0
    val row = ImageKernels.bmpFeatures(buf)
    assert(row.getLong(0) == 2 && row.getLong(1) == 2)
    assert(row.getLong(2) == (10L + 20 + 30 + 5) * 1000 / 4)
    // dhash bits: i = y*(w-1)+x -> bit0 = top row 20>10 = 1, bit1 = bottom 5>30 = 0
    assert(row.getLong(3) == 1L)
  }

  test("decoder rejects malformed bytes with null, never throws") {
    assert(ImageKernels.bmpFeatures(null) == null)
    assert(ImageKernels.bmpFeatures(Array.emptyByteArray) == null)
    assert(ImageKernels.bmpFeatures("not a bitmap at all, just text!!!!!!!!!!!!!!!!!!!!!!!!!!"
      .getBytes("UTF-8")) == null)
    // valid magic, truncated pixel data
    val truncated = ImageKernels.bmpEncode(42L).take(60)
    assert(ImageKernels.bmpFeatures(truncated) == null)
    // 8bpp flag rejected
    val wrongBpp = ImageKernels.bmpEncode(42L).clone()
    wrongBpp(28) = 8
    assert(ImageKernels.bmpFeatures(wrongBpp) == null)
  }

  test("bmp patches: fixed-grid tiling, edge in-bounds rule, row-major order, driver recompute (G14)") {
    // known ramp: bits = 0 -> v(x,y) = 128 - x everywhere
    val arr = ImageKernels.bmpPatches(ImageKernels.bmpEncode(0L), 4)
    assert(arr != null)
    // 9x8 at p=4: 3 tile columns (widths 4,4,1) x 2 tile rows
    assert(arr.numElements() == 6)
    val rows = (0 until 6).map(arr.getStruct(_, 5))
    // row-major (py, px) order
    assert(rows.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L), (1L, 1L), (1L, 2L)))
    // driver recompute of each tile over the known ramp
    for (r <- rows) {
      val (py, px) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val pix = for (y <- py * 4 until math.min(8, py * 4 + 4);
        x <- px * 4 until math.min(9, px * 4 + 4)) yield 128L - x
      assert(r.getLong(2) == pix.size, s"n_px tile ($py,$px)")
      assert(r.getLong(3) == pix.sum, s"sum_luma tile ($py,$px)")
      assert(r.getLong(4) == pix.sum * 1000L / pix.size,
        s"mean_milli tile ($py,$px)")
    }
    // the edge column tile is 1 wide: n_px = 4, all-constant luma 120
    assert(rows(2).getLong(2) == 4L && rows(2).getLong(4) == 120000L)
    // an arbitrary pattern agrees with a full per-pixel driver replay
    val bits = Hashing.mix64(99L)
    val arr2 = ImageKernels.bmpPatches(ImageKernels.bmpEncode(bits), 3)
    def luma(x: Int, y: Int): Long =
      128L + (0 until x).map(i =>
        if (((bits >>> (y * 8 + i)) & 1L) == 1L) 1L else -1L).sum
    assert(arr2.numElements() == 9) // ceil(9/3) x ceil(8/3) = 3 x 3
    for (i <- 0 until 9) {
      val r = arr2.getStruct(i, 5)
      val (py, px) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val pix = for (y <- py * 3 until math.min(8, py * 3 + 3);
        x <- px * 3 until math.min(9, px * 3 + 3)) yield luma(x, y)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ==
        (pix.size.toLong, pix.sum, pix.sum * 1000L / pix.size),
        s"tile ($py,$px) vs driver replay")
    }
    // unparseable input and nonsense patch size -> null (the contract)
    assert(ImageKernels.bmpPatches("junk".getBytes, 4) == null)
    assert(ImageKernels.bmpPatches(null, 4) == null)
    assert(ImageKernels.bmpPatches(ImageKernels.bmpEncode(0L), 0) == null)
  }

  test("bmp flip: exact mirror remap, involution, null contract (G15)") {
    val bits = Hashing.mix64(7L)
    val src = ImageKernels.bmpEncode(bits)
    val flipped = ImageKernels.bmpFlipH(src)
    assert(flipped != null)
    // flip . flip == identity, byte-for-byte (pure remap, no arithmetic)
    assert(ImageKernels.bmpFlipH(flipped).toSeq == src.toSeq)
    // per-pixel driver recompute: flipped (x, y) == original (8-x, y)
    def luma(bytes: Array[Byte], x: Int, y: Int): Int = {
      // bottom-up rows, 9x8, stride 28 ((9*3+3)/4*4), dataOff 54
      val o = 54 + (8 - 1 - y) * 28 + x * 3
      ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)) / 3
    }
    for (y <- 0 until 8; x <- 0 until 9)
      assert(luma(flipped, x, y) == luma(src, 8 - x, y), s"pixel ($x,$y)")
    // dims and parseability preserved: the family's decoder reads it
    val feats = ImageKernels.bmpFeatures(flipped)
    assert(feats != null && feats.getLong(0) == 9L && feats.getLong(1) == 8L)
    // mean luma is flip-invariant; the tile sums are NOT (the gate's
    // reason to compose with the tiler)
    assert(feats.getLong(2) == ImageKernels.bmpFeatures(src).getLong(2))
    val pSrc = ImageKernels.bmpPatches(src, 4)
    val pFlip = ImageKernels.bmpPatches(flipped, 4)
    val sums = (0 until 6).map(i => pFlip.getStruct(i, 5).getLong(3))
    val srcSums = (0 until 6).map(i => pSrc.getStruct(i, 5).getLong(3))
    assert(sums != srcSums, "flip must move luma mass across tiles")
    // the flipped left tile holds the source's RIGHT-side columns:
    // tile (py, 0) of flipped covers source x in {8,7,6,5}
    val expectLeft = (for (y <- 0 until 4; x <- 5 to 8) yield luma(src, x, y).toLong).sum
    assert(pFlip.getStruct(0, 5).getLong(3) == expectLeft)
    // null contract
    assert(ImageKernels.bmpFlipH(null) == null)
    assert(ImageKernels.bmpFlipH("junk".getBytes) == null)
  }

  test("bmp resize2x: exact box averages, odd-edge in-bounds rule, decode-null contract (G13)") {
    // bits = 0: every row ramps DOWN from 128 (all comparisons false)
    val out = ImageKernels.bmpResize2x(ImageKernels.bmpEncode(0L))
    val f = ImageKernels.bmpFeatures(out)
    assert(f.getLong(0) == 5L && f.getLong(1) == 4L, f.toString)
    // driver recompute: source pixel v(x,y) = 128 - x; output cell
    // (ox,oy) = floor-average of its in-bounds <= 4 sources
    val lumas = for (oy <- 0 until 4; ox <- 0 until 5) yield {
      val srcs = for (dy <- 0 until 2; dx <- 0 until 2;
        sx = ox * 2 + dx; sy = oy * 2 + dy; if sx < 9 && sy < 8)
        yield 128 - sx
      srcs.sum / srcs.size
    }
    assert(f.getLong(2) == lumas.map(_.toLong).sum * 1000L / 20L,
      s"mean ${f.getLong(2)} != driver recompute")
    // the 9th column halves to a 2-source cell: ox=4 averages x=8 only
    assert(lumas(4) == 120)
    // anything unparseable resizes to null (the family's contract)
    assert(ImageKernels.bmpResize2x("junk".getBytes) == null)
    assert(ImageKernels.bmpResize2x(null) == null)
  }
}
