package graft.operators

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {

  private lazy val raw = t.events
    .selectExpr("event_id", "user_id", "ts div 1000000 as ts_ms", "event_type")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("asof association matches a brute-force recompute (parser.py:421-432)") {
    val markers = raw.filter(_._4 == "error")
    val expected = raw.filter(_._4 != "error").map { case (id, u, ms, _) =>
      val nexts = markers.filter(m => m._2 == u && m._3 >= ms)
      val next =
        if (nexts.isEmpty) null
        else {
          val minTs = nexts.map(_._3).min
          java.lang.Long.valueOf(nexts.filter(_._3 == minTs).map(_._1).min)
        }
      id -> next
    }.toMap
    val got = EventOps.asofNextMarker(t).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap
    assert(got.size == expected.size)
    val diffs = expected.filter { case (k, v) => got(k) != v }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }

  test("backward asof matches a brute-force recompute; same-ms marker counts (B1b)") {
    val markers = raw.filter(_._4 == "error")
    val expected = raw.filter(_._4 != "error").map { case (id, u, ms, _) =>
      val prevs = markers.filter(m => m._2 == u && m._3 <= ms)
      val prev =
        if (prevs.isEmpty) null
        else {
          val maxTs = prevs.map(_._3).max
          // the window's last() sees same-ts markers ordered by id asc,
          // so the LARGEST id at the winning ts is the one in force
          java.lang.Long.valueOf(prevs.filter(_._3 == maxTs).map(_._1).max)
        }
      id -> prev
    }.toMap
    val got = EventOps.asofPrevMarker(t).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap
    assert(got.size == expected.size)
    val diffs = expected.filter { case (k, v) => got(k) != v }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
    // one user_id exchange, no join (the B1 shape with the frame flipped)
    val plan = EventOps.asofPrevMarker(t).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "backward asof must be join-free")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
  }

  test("bounded queue keeps the newest N per user (parser.py:470-481)") {
    val got = EventOps.lastNPerKey(t, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = got.groupBy(_._2)
    assert(byUser.values.forall(_.length <= 3))
    // rank 1 is the globally newest event of that user
    val newest = raw.groupBy(_._2).map { case (u, es) => u -> es.maxBy(e => (e._3, e._1))._1 }
    byUser.foreach { case (u, es) =>
      assert(es.find(_._3 == 1L).get._1 == newest(u))
    }
  }

  test("sessions split exactly on >1h silence") {
    val sessions = EventOps.sessionize(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    sessions.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 - a._5 > 3600000L) // next start vs prev end
        case _ =>
      }
      // inside a session no gap exceeds 1h: bounded by construction, spot
      // check via count parity with raw events
    }
    assert(sessions.map(_._3).sum == raw.length)
  }

  test("resume-from-token returns exactly the strict suffix") {
    val chk = raw.find(_._1 == 500L).get
    val expected = raw.filter(e => e._3 > chk._3 || (e._3 == chk._3 && e._1 > 500L))
      .map(_._1).sorted.toSeq
    val got = EventOps.resumeFromToken(t).collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("chunked range join equals the naive inequality join") {
    import org.apache.spark.sql.functions._
    // ground truth driver-side from the raw rows: count events inside
    // each interval [ts, ts+1h) opened by every 100th event
    val intervals = raw.filter(_._1 % 100 == 0)
      .map { case (id, _, ms, _) => (id, ms, ms + 3600000L) }
    val expected = intervals.map { case (id, s0, e0) =>
      val inside = raw.filter { case (_, _, ms, _) => ms >= s0 && ms < e0 }
      (id, inside.length.toLong, inside.map(_._1).min)
    }.filter(_._2 > 0).sortBy(_._1).toSeq
    val got = EventOps.rangeJoinEvents(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(expected.nonEmpty, "fixture must have occupied intervals")
    assert(got == expected)
    // a NON-aligned chunk width must not change results (chunking is a
    // pure execution strategy, not semantics)
    val odd = EventOps.rangeJoinEvents(t, chunkMs = 777013L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(odd == expected)
    // the whole point: the chunked plan is an equi-join, never the
    // O(points x intervals) nested loop the naive ON-clause plans to
    val plan = EventOps.rangeJoinEvents(t).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop range join in:\n$plan")
  }

  test("range join loudly rejects a pathological interval/chunk ratio") {
    import spark.implicits._
    val points = Seq((1L, 500L)).toDF("event_id", "pt")
    val yearMs = 365L * 24 * 3600 * 1000
    val hostile = Seq((1L, 0L, yearMs)).toDF("iv_id", "start_ms", "end_ms")
    // a year-long interval at 1-minute chunks is ~526k explode rows —
    // past the default cap, so the job must FAIL naming the operator
    // and the fix, not silently inflate the interval side
    val e = intercept[Throwable] {
      EventOps.rangeJoin(points, "pt", hostile, chunkMs = 60000L).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("rangeJoin")), s"rejection does not name rangeJoin: $e")
    // the documented remedies both work: chunkMs sized to the span...
    val ok = EventOps.rangeJoin(points, "pt", hostile, chunkMs = 3600000L)
      .collect()
    assert(ok.length == 1 && ok.head.getAs[Long]("iv_id") == 1L)
    // ...or consciously raising the cap for an intended explode factor
    val raised = EventOps.rangeJoin(points, "pt", hostile,
      chunkMs = 60000L, maxChunksPerInterval = 1000000L).collect()
    assert(raised.length == 1)
  }

  test("latest-state compaction elects each key's newest version, agg-only plan") {
    val got = EventOps.latestState(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    val expected = raw.groupBy(_._2).map { case (u, es) =>
      val newest = es.maxBy(e => (e._3, e._1))
      (u, newest._1, newest._3, es.length.toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    // the scale claim: compaction is a partial-aggregated hash agg, not
    // a per-key sort — no Window/Sort-based election in the plan
    val plan = EventOps.latestState(t).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window election in:\n$plan")
  }

  test("scd2 intervals tile each key's history with one current row") {
    val got = EventOps.scd2Intervals(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(got.length == raw.length)
    got.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      // each version's valid_to is exactly the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"gap at user $u")
        case _ =>
      }
      // exactly one open (current) interval per key, and it is the last
      assert(rows.count(_._5 == 1L) == 1)
      assert(sorted.last._5 == 1L && sorted.last._4.isEmpty)
    }
  }

  test("rate anomaly z-scores match a driver-side recompute of the trailing stats") {
    val trail = 24
    val got = EventOps.rateAnomaly(t).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val counts = got.map(g => (g._1, g._2)).sortBy(_._1)
    val expected = counts.zipWithIndex.map { case ((bucket, n), i) =>
      val win = counts.slice(math.max(0, i - trail), i).map(_._2)
      val (tc, ts, tq) = (win.length.toLong, win.sum, win.map(x => x * x).sum)
      val varNum = tc * tq - ts * ts
      if (tc == trail && varNum > 0) {
        val z = (n * tc - ts).toDouble / tc.toDouble /
          math.sqrt(varNum.toDouble / (tc * tc).toDouble)
        val z4 = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (bucket, n, Some(z4), Some(if (math.abs(z4) > 3.0) 1L else 0L))
      } else (bucket, n, None, None)
    }
    assert(got.toSeq == expected.toSeq)
    // warmup rows (first `trail` buckets) carry no verdict
    assert(got.take(trail).forall(_._3.isEmpty))
    assert(got.drop(trail).exists(_._3.nonEmpty))
  }

  test("funnel: stage minima match a driver recompute and respect order (B26, N=4)") {
    val stages = Seq("signup", "view", "click", "purchase")
    val evs = t.events.select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 1000000L))
      .groupBy(_._1)
    val got = EventOps.funnelStages(t).collect()
      .map(r => (r.getLong(0),
        stages.indices.map(i => Option(r.get(i + 1)).map(_.asInstanceOf[Long])),
        r.getLong(stages.length + 1)))
    assert(got.nonEmpty && got.length == evs.size)
    got.foreach { case (uid, ts, stage) =>
      val rows = evs(uid)
      def minAfter(tp: String, gate: Option[Long]): Option[Long] =
        gate.flatMap(g => rows.collect {
          case (_, `tp`, ms) if ms >= g => ms
        }.minOption)
      val exp = stages.tail.scanLeft(
        rows.collect { case (_, s, ms) if s == stages.head => ms }.minOption) {
        (gate, st) => minAfter(st, gate) }
      assert(ts == exp, s"user $uid stage times")
      assert(stage == exp.count(_.nonEmpty).toLong, s"user $uid stage")
    }
  }

  test("funnel: out-of-order stages are gated, not counted (B26 fixture)") {
    import spark.implicits._
    val e = Seq(
      // u1: click precedes the first view — that click must not count;
      // a later click does, and the purchase between them must not
      (1L, "click", 10L), (1L, "view", 20L), (1L, "purchase", 25L),
      (1L, "click", 30L), (1L, "purchase", 40L),
      // u2: full funnel in order, same-ms click counts (>= gate)
      (2L, "view", 10L), (2L, "click", 10L), (2L, "purchase", 15L),
      // u3: never enters the funnel (no view)
      (3L, "click", 5L), (3L, "purchase", 6L))
      .toDF("user_id", "event_type", "ts_ms")
    val got = EventOps.funnelStagesOf(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, Some(20L), Some(30L), Some(40L), 3L),
      (2L, Some(10L), Some(10L), Some(15L), 3L),
      (3L, None, None, None, 0L)))
  }

  test("funnel: the fold generalizes to N≠3 stages (round-13 B26)") {
    import spark.implicits._
    val e = Seq(
      // u1: 4 stages in order, but the pre-signup view is gated out —
      // the later view (25) gates the click chain
      (1L, "view", 5L), (1L, "signup", 20L), (1L, "view", 25L),
      (1L, "click", 30L), (1L, "purchase", 40L),
      // u2: stalls at stage 2 of 4 (click precedes the gating view)
      (2L, "signup", 10L), (2L, "click", 12L), (2L, "view", 15L),
      // u3: same-ms boundary chain is allowed at every hop
      (3L, "signup", 7L), (3L, "view", 7L), (3L, "click", 7L),
      (3L, "purchase", 7L))
      .toDF("user_id", "event_type", "ts_ms")
    val got4 = EventOps.funnelStagesOf(
      e, Seq("signup", "view", "click", "purchase"))
    assert(got4.columns.toSeq == Seq("user_id", "signup_ms", "view_ms",
      "click_ms", "purchase_ms", "stage", "ms_to_convert"))
    val rows4 = got4.collect().map(r => (r.getLong(0),
      (1 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])),
      r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Long])))
    assert(rows4.toSeq == Seq(
      (1L, Seq(Some(20L), Some(25L), Some(30L), Some(40L)), 4L, Some(20L)),
      (2L, Seq(Some(10L), Some(15L), None, None), 2L, None),
      (3L, Seq(Some(7L), Some(7L), Some(7L), Some(7L)), 4L, Some(0L))))
    // two-stage degenerate form: just a gated pair
    val rows2 = EventOps.funnelStagesOf(e, Seq("view", "purchase"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        r.getLong(3)))
    assert(rows2.toSeq == Seq(
      (1L, Some(5L), Some(40L), 2L),
      (2L, Some(15L), None, 1L),
      (3L, Some(7L), Some(7L), 2L)))
    // guards: <2 stages and duplicate stages are authoring errors
    intercept[IllegalArgumentException](
      EventOps.funnelStagesOf(e, Seq("view")))
    intercept[IllegalArgumentException](
      EventOps.funnelStagesOf(e, Seq("view", "view")))
  }

  test("funnel: one exchange total (windows and collapse share the user partitioning)") {
    val plan = EventOps.funnelStages(t).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"funnel should shuffle once, got $exchanges:\n$plan")
  }

  test("cohort retention matches a driver recompute (B27)") {
    val userDays = raw.map { case (_, u, ms, _) => (u, ms / 86400000L) }.distinct
    val firstDay = userDays.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val cells = userDays
      .groupBy { case (u, d) => (firstDay(u), d - firstDay(u)) }
      .map { case (k, vs) => k -> vs.length.toLong }
    val got = EventOps.cohortRetention(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == cells.size, "cell count")
    cells.foreach { case ((cd, off), n) =>
      val size = cells((cd, 0L))
      assert(got((cd, off)) == ((n, size, n * 1000L / size)),
        s"cell ($cd, $off)")
    }
    // every user lands in exactly one cohort, and offset-0 cells cover all users
    assert(cells.collect { case ((_, 0L), n) => n }.sum == firstDay.size)
  }

  test("cohort retention: planted fixture — gaps, full retention, singleton cohort (B27)") {
    import spark.implicits._
    val e = Seq(
      // cohort day 0: u1 active days 0,1,3; u2 active days 0,1 — day-2 gap cell absent for u2
      (1L, 0L), (1L, 1L), (1L, 3L), (2L, 0L), (2L, 1L),
      // cohort day 2: u3 alone, active only on its first day
      (3L, 2L))
      .toDF("user_id", "day")
    val got = EventOps.cohortRetentionOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1000L),
      (0L, 1L, 2L, 2L, 1000L),
      (0L, 3L, 1L, 2L, 500L),
      (2L, 0L, 1L, 1L, 1000L)))
  }

  test("cohort retention: one event-scale exchange (per-user agg partial-aggregates map-side)") {
    val q = EventOps.cohortRetention(t)
    val plan = q.queryExecution.executedPlan.toString
    // exactly one exchange partitions on user_id (the only event-scale
    // shuffle); the cell agg and window exchanges carry per-cell rows
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userExchanges == 1, s"expected one user_id exchange:\n$plan")
    // the per-user agg must partial-aggregate before that exchange
    assert("partial_collect_set|objHashAggregate|ObjectHashAggregate".r
      .findAllIn(plan).nonEmpty, s"expected map-side partial collect_set:\n$plan")
  }

  test("session transcripts: ordered assembly, gap splits, one user_id exchange (B28)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted: user 1 has two sessions (gap > 1h), order within session
    // decided by ts then event_id; user 2 one session out-of-arrival-order
    val h = 3600000L
    val e = Seq(
      (1L, 1L, 0L, "a"), (1L, 2L, 1000L, "b"), (1L, 3L, 1000L, "c"),
      (1L, 4L, 2 * h + 1000L, "d"),
      (2L, 5L, 500L, "y"), (2L, 6L, 100L, "x"))
      .toDF("user_id", "event_id", "ts_ms", "event_type")
    val got = graft.operators.EventOps.sessionTranscriptsOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 1000L, "a>b>c"),
      (1L, 2L, 1L, 0L, "d"),
      (2L, 1L, 2L, 400L, "x>y")))
    val plan = graft.operators.EventOps.sessionTranscripts(t)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"transcript assembly must ride the window's user_id exchange, got $exchanges:\n$plan")
  }
}
