package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Ngram3Kernel, PqAssignKernel, SketchKernels}

/** Property checks for the hash/sketch kernels over ARBITRARY inputs —
  * the fixed-fixture specs pin known answers; these pin the structural
  * laws the operators lean on (order independence, independent-arithmetic
  * agreement, argmin correctness) across generated cases. Samples are
  * drawn from seeded ScalaCheck generators so failures reproduce. */
class KernelPropertySpec extends AnyFunSuite {

  /** Deterministic sample stream from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("mix64 agrees with an independent BigInt mod-2^64 recompute") {
    val M = BigInt(1) << 64
    def ref(z0: Long): Long = {
      def u(b: BigInt): BigInt = b.mod(M)
      var z = u(BigInt(z0) + BigInt("9e3779b97f4a7c15", 16))
      z = u((z ^ (z >> 30)) * BigInt("bf58476d1ce4e5b9", 16))
      z = u((z ^ (z >> 27)) * BigInt("94d049bb133111eb", 16))
      (u(z ^ (z >> 31)) - (if (u(z ^ (z >> 31)) >= M / 2) M else BigInt(0))).toLong
    }
    samples(Gen.long, 500).foreach { v =>
      assert(Hashing.mix64(v) == ref(v), s"mix64 mismatch at $v")
    }
    // the corner values Long arithmetic gets wrong first
    Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(Hashing.mix64(v) == ref(v), s"mix64 mismatch at corner $v")
    }
  }

  test("ngram3 hash count equals the distinct 3-gram count") {
    val g = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ', 'é', '中'))).map(_.mkString))
    samples(g, 300).foreach { s =>
      val grams = (0 until math.max(0, s.length - 2)).map(i => s.substring(i, i + 3)).toSet
      val got = Ngram3Kernel.hashes(UTF8String.fromString(s)).numElements()
      assert(got == grams.size, s"'$s': $got hashes vs ${grams.size} grams")
    }
  }

  test("minhash and simhash signatures are order- and duplicate-independent") {
    val tok = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
    val g = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, tok))
    def arr(ts: Seq[String]) =
      new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])
    samples(g, 200).foreach { ts =>
      val shuffled = scala.util.Random.shuffle(ts)
      val doubled = ts ++ ts
      val base = SketchKernels.minhashBandSigs(arr(ts), 40, 10)
      assert(base.toLongArray.sameElements(
        SketchKernels.minhashBandSigs(arr(shuffled), 40, 10).toLongArray),
        s"minhash order-dependent on $ts")
      // duplicates leave per-seed minima unchanged
      assert(base.toLongArray.sameElements(
        SketchKernels.minhashBandSigs(arr(doubled), 40, 10).toLongArray),
        s"minhash duplicate-dependent on $ts")
      // simhash is a per-token VOTE: order must not matter (duplicates
      // legitimately shift votes, so only order is tested)
      assert(SketchKernels.simhashSig(arr(ts)) == SketchKernels.simhashSig(arr(shuffled)),
        s"simhash order-dependent on $ts")
    }
  }

  test("oph band signatures are order- and duplicate-independent") {
    val g = Gen.chooseNum(1, 100).flatMap(n => Gen.listOfN(n, Gen.long))
    samples(g, 200).foreach { hs =>
      def arr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)
      val base = SketchKernels.ophBandSigsLong(arr(hs), 64, 8)
      val shuffled = scala.util.Random.shuffle(hs)
      assert(base.toLongArray.sameElements(
        SketchKernels.ophBandSigsLong(arr(shuffled), 64, 8).toLongArray),
        s"oph order-dependent on $hs")
      assert(base.toLongArray.sameElements(
        SketchKernels.ophBandSigsLong(arr(hs ++ hs), 64, 8).toLongArray),
        s"oph duplicate-dependent")
    }
  }

  test("lsh bucket/probe kernels agree with an independent recompute") {
    import graft.plans.LshKernel
    val (tables, bits) = (8, 6)
    val gv = Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5.0, 5.0)))
    samples(gv, 100).foreach { v =>
      val arr = new GenericArrayData(v.toArray)
      val got = LshKernel.buckets(arr, tables, bits).toLongArray
      // independent recompute: per-table sign bits of the same seeded
      // projections (Seq.sum is the same left fold as the kernel loop)
      val want = (0 until tables).map { k =>
        var bucket = 0L
        (0 until bits).foreach { j =>
          val proj = v.zipWithIndex.map { case (x, i) =>
            x * (Hashing.mix64((k.toLong * 1009L + j) * 131071L + i) % 500L).toDouble
          }.sum
          if (proj >= 0.0) bucket |= (1L << j)
        }
        (k.toLong << 32) | bucket
      }.toArray
      assert(got.sameElements(want), s"buckets mismatch on $v")
      // probes: slot 0 of each table is the base bucket; slot 1+j flips
      // exactly bit j of the low half and keeps the table tag
      val probes = LshKernel.probes(arr, tables, bits).toLongArray
      assert(probes.length == tables * (bits + 1))
      (0 until tables).foreach { k =>
        val base = want(k)
        assert(probes(k * (bits + 1)) == base)
        (0 until bits).foreach { j =>
          assert(probes(k * (bits + 1) + 1 + j) == (base ^ (1L << j)),
            s"probe flip $j of table $k wrong")
        }
      }
    }
  }

  test("pq assignment is the true per-subspace argmin with lowest-id ties") {
    val g = for {
      m <- Gen.oneOf(1, 2, 4)
      sub <- Gen.oneOf(1, 2, 3)
      k <- Gen.oneOf(2, 3, 4)
      v <- Gen.listOfN(m * sub, Gen.chooseNum(-5.0, 5.0))
      cb <- Gen.listOfN(m * k * sub, Gen.chooseNum(-5.0, 5.0))
    } yield (m, sub, k, v.toArray, cb.toArray)
    samples(g, 200).foreach { case (m, sub, k, v, cb) =>
      val got = PqAssignKernel.assign(
        new GenericArrayData(v), new GenericArrayData(cb), m).toIntArray
      (0 until m).foreach { j =>
        // independent brute recompute of the subspace argmin
        val dists = (0 until k).map { c =>
          (0 until sub).map { x =>
            val d = v(j * sub + x) - cb((j * k + c) * sub + x); d * d
          }.sum
        }
        val best = dists.zipWithIndex.minBy { case (d, c) => (d, c) }._2
        assert(got(j) == best,
          s"subspace $j: got ${got(j)}, brute argmin $best (dists $dists)")
      }
    }
  }

  test("wav codec: encode->decode stats equal brute recomputes over arbitrary seeds") {
    import graft.plans.AudioKernels
    for (seed <- samples(Gen.long, 120); silent <- Seq(false, true)) {
      val s = Array.tabulate(AudioKernels.NumSamples)(i =>
        AudioKernels.pcmSample(seed, i, silent))
      val row = AudioKernels.wavFeatures(AudioKernels.wavEncode(seed, silent))
      assert(row != null, s"decode failed for seed $seed")
      assert(row.getLong(2) == s.map(x => math.abs(x.toLong)).max)
      assert(row.getLong(3) == s.map(x => math.abs(x.toLong)).sum)
      assert(row.getLong(4) ==
        (1 until s.length).count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong)
      var sig = 0L
      for (i <- 0 until s.length - 1)
        if (math.abs(s(i + 1).toLong) > math.abs(s(i).toLong)) sig |= 1L << i
      assert(row.getLong(5) == sig, s"env_sig mismatch for seed $seed")
    }
  }
}
