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

  test("mm_scene_cuts equals the lag rule over decoded means; one user exchange (G9)") {
    import org.apache.spark.sql.functions._
    // independent recompute: decoded means from the G2 feature path,
    // lagged in the driver
    val means = Multimodal.mmFeaturesBmp(t)
      .join(t.events.select(col("event_id"), col("user_id")), "event_id")
      .select("user_id", "event_id", "mean_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = means.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(_._2)
      s.zip(s.drop(1)).collect {
        case ((u, _, p), (_, e, m)) if math.abs(m - p) >= 2000L =>
          (u, e, m, p, m - p)
      }
    }.toSet
    val got = Multimodal.mmSceneCuts(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect, s"got ${got.size} cuts, expected ${expect.size}")
    assert(got.nonEmpty, "fixture must produce cuts")
    // plan: the lag window rides ONE user_id exchange (plus the
    // presentation range sort)
    val plan = Multimodal.mmSceneCuts(t).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("mm_audio_vad gate separates the planted silent population EXACTLY (G8b)") {
    graft.plans.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions._
    // per-frame gate verdicts, recomputed independently of the rollup
    val f = call_function("graft_wav_features",
      call_function("graft_wav_encode", col("event_id"), col("event_id") % 5 === 0))
    val verdicts = t.events
      .select(col("event_id"),
        (f.getField("sum_abs") >= f.getField("n_samples") * 4096L).as("voiced"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    assert(verdicts.nonEmpty)
    // the gate must equal the plant: voiced iff event_id % 5 != 0 —
    // silent frames are bounded at sum|s| <= 64*128, voiced ones sit
    // ~2000x above the threshold, so NO frame may straddle it
    verdicts.foreach { case (id, voiced) =>
      assert(voiced == (id % 5 != 0), s"gate misclassified event $id")
    }
    // and the rollup conserves counts: sum over users == total frames
    val rolled = Multimodal.mmAudioVad(t).collect()
    assert(rolled.map(_.getLong(1)).sum == verdicts.length)
    assert(rolled.map(_.getLong(2)).sum == verdicts.count(_._2))
  }

  test("mm_audio_features rides the EBML transport: decode(firstBlock(encode)) == direct decode (G8)") {
    graft.plans.VectorFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val direct = call_function("graft_wav_features",
      call_function("graft_wav_encode", col("event_id"), col("event_id") % 5 === 0))
    val expect = t.events
      .select(col("event_id"), direct.getField("env_sig").as("sig"),
        direct.getField("zero_crossings").as("zc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Multimodal.mmAudioFeatures(t)
      .select("event_id", "env_sig", "zero_crossings")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, "EBML block transport must be byte-lossless for audio frames")
  }
}
