package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("mm_frame_dedup banded pairs are COMPLETE vs brute-force Hamming (G6 pigeonhole)") {
    // brute force over the decoded dHashes of the sampled frame
    // library (the operator's every=10 domain)
    val sigs = Multimodal.mmFeaturesBmp(t)
      .filter("event_id % 10 = 0")
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
    // the planted structure: every 4th event of a user is a <=2-bit
    // perturbation of the user's base frame; within the sampled domain
    // (% 10) that is ids % 20 == 0, and all such same-user pairs must
    // be found (the sampled set also carries non-family noise frames)
    val users = t.events.select("event_id", "user_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = (for {
      (a, ua) <- users.iterator if a % 20 == 0
      (b, ub) <- users if ub == ua && b > a && b % 20 == 0
    } yield (a, b)).toSet
    assert(planted.nonEmpty)
    assert(planted.forall(p => banded.exists(x => (x._1, x._2) == p)),
      "every planted same-user family pair must be detected")
  }
}
