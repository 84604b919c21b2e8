package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("mm_frame_dedup banded pairs are COMPLETE vs brute-force Hamming (G6 pigeonhole)") {
    // brute force over the decoded dHashes (1000 events at sf0.001 ->
    // 500k driver-side comparisons)
    val sigs = Multimodal.mmFeaturesBmp(t)
      .select("event_id", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if h <= 6
    } yield {
      val (a, b) = if (sigs(i)._1 < sigs(j)._1) (sigs(i)._1, sigs(j)._1)
        else (sigs(j)._1, sigs(i)._1)
      (a, b, h.toLong)
    }).toSet
    val banded = Multimodal.mmFrameDedup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs != brute ${brute.size}: " +
        s"missing ${(brute -- banded).take(5)}, extra ${(banded -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must plant near-duplicate frames")
    // the planted structure: every 5th event of a user is a <=2-bit
    // perturbation of the user's base frame, so same-user pairs with
    // both ids % 5 == 0 must all be found
    val users = t.events.select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = (for {
      (a, ua) <- users.iterator if a % 5 == 0
      (b, ub) <- users if ub == ua && b > a && b % 5 == 0
    } yield (a, b)).toSet
    assert(planted.forall(p => banded.exists(x => (x._1, x._2) == p)),
      "every planted same-user family pair must be detected")
  }
}
