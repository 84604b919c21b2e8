package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** The reference consumer's stream semantics, re-expressed as relational
  * operators over the `events` table (SURVEY §2B).
  *
  * `events.ts` arrives as long nanoseconds (nanosAsLong); every operator
  * works on exact epoch-ms longs so results are bit-identical to the DuckDB
  * oracle regardless of timestamp precision.
  *
  * Scale notes: each operator is one shuffle on `user_id` (the stream key) —
  * the same partitioning a 1000-executor cluster would use for keyed stream
  * state. Nothing here does a driver-side loop or a correlated join: the
  * as-of association is the union+window trick, which scales linearly.
  */
object EventOps {

  private def withMs(t: Tables): DataFrame =
    t.events.withColumn("ts_ms", nanosToMs(col("ts")))

  /** B1 — forward as-of association, the Spark form of parser.py:421-432
    * (each packet takes the first tag-set at a position >= its own).
    * Markers are 'error' events; every other event is associated with the
    * next marker of the same user. Implemented as ONE window pass over a
    * union ordering — no join, no correlated subquery. */
  def asofNextMarker(t: Tables): DataFrame = {
    val e = withMs(t).select(
      col("event_id"), col("user_id"), col("ts_ms"), col("event_type"),
      when(col("event_type") === "error", col("event_id")).as("marker_id"))
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("marker_id").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    e.withColumn("next_marker", first(col("marker_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "error")
      .select("event_id", "next_marker")
      .orderBy("event_id")
  }

  /** B1b — BACKWARD as-of association (round 13, the mirror of B1 and
    * the standard "state at time T" lookup shape): each event takes the
    * most recent marker at ts <= its own — where B1 answers "which
    * tag-set arrives next" (the reference's forward positional rule),
    * this answers "which state was in force when the event happened",
    * the join every SCD-2/warehouse pipeline runs. Same ONE-window-pass
    * shape over the union ordering — no join, no correlated subquery,
    * one user_id exchange. Tie rule: a marker at the event's exact ts
    * counts (<=, because the null marker_id sorts the event row after
    * same-ts markers), the complement of B1's strict "position >". */
  def asofPrevMarker(t: Tables): DataFrame = {
    val e = withMs(t).select(
      col("event_id"), col("user_id"), col("ts_ms"), col("event_type"),
      when(col("event_type") === "error", col("event_id")).as("marker_id"))
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("marker_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("prev_marker", last(col("marker_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "error")
      .select("event_id", "prev_marker")
      .orderBy("event_id")
  }

  /** B2 — time-span sampling (parser.py:460-463): keep the first event per
    * (user, 1-hour bucket). */
  def sampleFirstPerWindow(t: Tables): DataFrame = {
    val e = withMs(t).withColumn("bucket", msBucket(col("ts_ms"), 3600000L))
    val w = Window.partitionBy("user_id", "bucket").orderBy(col("ts_ms"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "bucket")
      .orderBy("user_id", "bucket")
  }

  /** B3 — bounded queue keeping the newest N per key (parser.py:470-481). */
  def lastNPerKey(t: Tables, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms").desc, col("event_id").desc)
    withMs(t)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .select(col("event_id"), col("user_id"), col("rn").cast("long").as("rn"))
      .orderBy("user_id", "rn")
  }

  /** B4 — rate monitoring: counts + value sums per 10-minute tumbling
    * window (the usage example's frames-per-interval logging,
    * parser.py:568-575). */
  def rateTumbling(t: Tables): DataFrame =
    withMs(t)
      .withColumn("bucket", msBucket(col("ts_ms"), 600000L))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy("bucket")

  /** B5 — lag monitoring (MILLIS_BEHIND_NOW analog): per-user newest event
    * vs the global stream head. ONE events pass, structurally: the head is
    * a global-frame window over the per-user aggregates, so the plan has a
    * single events scan by construction. (An agg-of-agg branch relies on
    * ReuseExchange, which column pruning defeats here — the head branch's
    * pruned partial agg no longer canonicalizes equal to the main one.)
    * The window's single-partition exchange carries #users rows of
    * (user_id, max, n) — per-key aggregates, not events; at 100 TB that is
    * the same reduction every global-top-k query makes, and it replaces a
    * second full scan of the fact table. */
  def lagMonitor(t: Tables): DataFrame = {
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withMs(t)
      .groupBy("user_id")
      .agg(max(col("ts_ms")).as("user_max_ms"), count(lit(1)).as("n"))
      .withColumn("head_ms", max(col("user_max_ms")).over(w))
      .select(
        col("user_id"),
        (col("head_ms") - col("user_max_ms")).as("behind_ms"),
        col("n"))
      .orderBy("user_id")
  }

  /** B6 — continuation-token resume (parser.py:292-303): return the stream
    * strictly after checkpoint event 500, ordered. The checkpoint row is a
    * broadcast scalar, the filter pushes to the scan. */
  def resumeFromToken(t: Tables, tokenEventId: Long = 500L): DataFrame = {
    val e = withMs(t)
    val chk = e.filter(col("event_id") === tokenEventId)
      .select(col("ts_ms").as("chk_ms"), col("event_id").as("chk_id"))
    e.crossJoin(broadcast(chk))
      .filter(col("ts_ms") > col("chk_ms") ||
        (col("ts_ms") === col("chk_ms") && col("event_id") > col("chk_id")))
      .select("event_id")
      .orderBy("event_id")
  }

  /** B7 — sessionization (reconnect epochs, parser.py:178-269): a new
    * session whenever a user is silent > 1 hour; per-session aggregates. */
  def sessionize(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    withMs(t)
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 3600000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n"),
        min(col("ts_ms")).as("start_ms"),
        max(col("ts_ms")).as("end_ms"))
      .orderBy("user_id", "session_id")
  }

  /** B28 — SESSION-TRANSCRIPT assembly (round 13): turn the sessionized
    * event log into one ordered transcript row per session — the
    * chat/interaction-corpus construction step an LLM data pipeline
    * runs between sessionization and tokenization (each transcript is
    * a training document). Same session rule as [[sessionize]] (gap >
    * 1 h splits), same SINGLE user_id exchange: the window labels
    * sessions and the per-session agg rides the window's partitioning
    * (subset rule). The collected payload is session-bounded metadata
    * (event types + timestamps, not raw payloads), the G5c justification
    * — a session fits executor memory at any corpus scale; sort_array
    * over (ts_ms, event_id) structs makes the concatenation order total
    * and partitioning-independent. */
  def sessionTranscripts(t: Tables, gapMs: Long = 3600000L): DataFrame =
    sessionTranscriptsOf(withMs(t), gapMs)

  /** Library form over any (user_id, event_id, ts_ms, event_type). */
  def sessionTranscriptsOf(e: DataFrame, gapMs: Long = 3600000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    e
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_turns"),
        (max(col("ts_ms")) - min(col("ts_ms"))).as("dur_ms"),
        array_join(
          transform(
            sort_array(collect_list(struct(
              col("ts_ms"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("transcript"))
      .orderBy("user_id", "session_id")
  }

  /** B7b — reconnect accounting (parser.py:223-229): the reference counts
    * a reconnect after at least one successfully-read packet as a RENEWAL
    * (the continuation token advanced; the counter resets the failure
    * budget) and one that produced no packets as an ATTEMPT, stopping once
    * attempts exceed reconnect_max_count. Batch analog per stream key:
    * renewals = session transitions beyond the first epoch (every new
    * session resumes from a successful one — our sessions contain data by
    * construction); attempts = error-marker events (connections that
    * surfaced AWS_KINESISVIDEO_ERROR_* instead of packets);
    * `gave_up` flags keys whose attempts ran over the budget. Same single
    * user_id shuffle as sessionize. */
  def reconnectAccounting(t: Tables, reconnectMaxCount: Long = 10L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    withMs(t)
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 3600000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(
        (sum(col("new_sess")) - lit(1L)).as("n_renewals"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_attempts"),
        count(lit(1)).as("n_events"))
      .withColumn("gave_up", (col("n_attempts") > reconnectMaxCount).cast("long"))
      .orderBy("user_id")
  }

  /** B23 — changelog compaction (CDC upsert, latest-wins MERGE): fold a
    * keyed change stream down to each key's current state. The reference
    * consumer keeps exactly this per-stream "newest tag set" state
    * (parser.py:421-432 holds the latest tag snapshot per stream); the
    * batch form is the compaction every CDC/event-sourced table needs
    * before serving point lookups.
    *
    * Scale shape: ONE partial-aggregated hash agg — the latest version is
    * `max(struct(ts_ms, event_id, ...))` (struct comparison is
    * lexicographic and (ts_ms, event_id) is a total order), so every map
    * task combines its partitions' versions down to one row per key
    * before the exchange. The obvious row_number()-over-window form
    * instead shuffles and SORTS every version of every key — at 100 TB of
    * change history the combiner-tree agg is the difference between
    * shuffling #keys rows and shuffling the whole log. */
  def latestState(t: Tables): DataFrame =
    latestStateCore(withMs(t)).orderBy("user_id")

  /** The orderBy-free election core — shared with the streaming twin
    * ([[graft.streaming.EventStreams.latestStateStream]]): a plain
    * streaming-legal aggregation, so in Update mode the per-key state IS
    * the compacted row. Input needs (user_id, ts_ms, event_id,
    * event_type, value). */
  private[graft] def latestStateCore(e: DataFrame): DataFrame =
    e.select(col("user_id"),
        struct(col("ts_ms"), col("event_id"), col("event_type"),
          cents(col("value")).as("value_c")).as("st"))
      .groupBy("user_id")
      .agg(max(col("st")).as("st"), count(lit(1)).as("n_versions"))
      .select(col("user_id"),
        col("st.event_id").as("last_event_id"),
        col("st.ts_ms").as("last_ms"),
        col("st.event_type").as("last_type"),
        col("st.value_c").as("last_value_c"),
        col("n_versions"))

  /** B24 — SCD-2 validity intervals: turn the same keyed change log into
    * slowly-changing-dimension rows, each version valid from its own
    * timestamp until the key's next change ([valid_from_ms, valid_to_ms),
    * NULL = still current). The standard warehouse shape for "what was
    * this key's state at time T" joins (then served by [[rangeJoin]]).
    * One window pass over rows hash-partitioned by key — the same single
    * user_id exchange as sessionize; no self-join, no correlated
    * subquery. */
  def scd2Intervals(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    withMs(t)
      .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(w))
      .withColumn("is_current", col("valid_to_ms").isNull.cast("long"))
      .select(col("user_id"), col("event_id"),
        col("ts_ms").as("valid_from_ms"), col("valid_to_ms"), col("is_current"))
      .orderBy("user_id", "valid_from_ms", "event_id")
  }

  /** B25 — rate ANOMALY detection: flag tumbling windows whose event
    * count is a z-score outlier against the trailing `trail` windows —
    * the alerting layer over B4's rate monitor (the reference's
    * frames-per-interval logging exists to be eyeballed for exactly
    * these spikes; this puts the threshold in the plan).
    *
    * Bit-stability discipline (SURVEY §4): the trailing mean/variance are
    * carried as EXACT int64 sums (count, Σn, Σn²) inside the window
    * frame; the float leaves integers only in the final z expression,
    * which is a fixed sequence of correctly-rounded ops — one division
    * for the deviation, one for the variance, one sqrt, one division for
    * z — then a single 4dp round. The oracle replays the identical
    * sequence, so z4 is hash-exact, not approximately-equal.
    *
    * Scale shape: the corpus-sized work is the B4 bucket agg (partial-
    * aggregated, one exchange); the window runs over the BUCKET rows —
    * data already reduced to one row per 10 minutes, the lag_monitor
    * rule for a justified global-order window (a year of 10-minute
    * buckets is ~53k rows). The frame is ROWS over observed buckets:
    * empty buckets don't emit rows, so a gap widens the baseline span
    * rather than zero-filling it (documented; a zero-filled variant
    * would sequence() the bucket range first). z is NULL until the
    * baseline is fully warmed (t_cnt = trail) or when the baseline is
    * flat (variance 0). */
  def rateAnomaly(t: Tables, widthMs: Long = 600000L, trail: Int = 24,
      zThreshold: Double = 3.0): DataFrame = {
    val counts = withMs(t)
      .withColumn("bucket", msBucket(col("ts_ms"), widthMs))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("bucket").rowsBetween(-trail, -1)
    // the trailing sums stay int64 outputs (safe to ~6e8 events/bucket),
    // but their PRODUCTS t_cnt*t_sumsq and t_sum² wrap int64 at ~1.3e8
    // events per 10-minute bucket (~210k events/s — a plausible deploy
    // rate), and with ANSI off the wrap is silent. The products are
    // therefore computed in decimal(38,0) — exact to 38 digits, matching
    // the oracle's int128 — before the >0 test and the double cast.
    val d38 = "decimal(38,0)"
    val varNum = col("t_cnt").cast(d38) * col("t_sumsq").cast(d38) -
      col("t_sum").cast(d38) * col("t_sum").cast(d38)
    val z = (col("n") * col("t_cnt") - col("t_sum")).cast("double") /
      col("t_cnt").cast("double") /
      sqrt(varNum.cast("double") / (col("t_cnt") * col("t_cnt")).cast("double"))
    counts
      .withColumn("t_cnt", count(lit(1)).over(w))
      .withColumn("t_sum", sum(col("n")).over(w))
      .withColumn("t_sumsq", sum(col("n") * col("n")).over(w))
      .withColumn("z4",
        when(col("t_cnt") === trail.toLong && varNum > 0L, round(z, 4)))
      .withColumn("is_spike",
        when(col("z4").isNotNull, (abs(col("z4")) > zThreshold).cast("long")))
      .select(col("bucket"), col("n"), col("t_cnt"), col("t_sum"),
        col("t_sumsq"), col("z4"), col("is_spike"))
      .orderBy("bucket")
  }

  /** C16 — RANGE (interval-containment) JOIN via chunking. Spark has no
    * native range join: `ON pt >= start AND pt < end` plans as a
    * BroadcastNestedLoopJoin — O(|points| × |intervals|) scans at any
    * cluster size. The scale form buckets time into fixed-width chunks:
    * each interval explodes into the chunks it covers, each point maps
    * to its SINGLE chunk, and the join becomes an EQUI-join on the
    * chunk id plus a residual containment filter. A (point, interval)
    * pair can only meet in the point's one chunk, so every pair is
    * emitted exactly once — no dedup. Chunk width ≈ the typical
    * interval length keeps the interval explode factor at ≤ 2 while
    * the equi-join prunes all non-neighboring chunk pairs.
    *
    * `points` carries (`ptCol`: epoch-ms long, any payload);
    * `intervals` carries (iv_id, start_ms, end_ms) with end EXCLUSIVE.
    * Degenerate intervals (end <= start) match nothing and are dropped
    * before the explode (a descending sequence would throw).
    *
    * Explode-factor guard: an interval spanning far more chunks than
    * the doc's "chunk ≈ typical interval" rule anticipates would
    * silently inflate the interval side span/chunk-fold — a caller
    * picking chunkMs ≪ the real span turns one hostile year-long
    * interval at 1-minute chunks into ~526k rows. Any single interval
    * covering more than `maxChunksPerInterval` chunks fails the job
    * LOUDLY (per-row raise_error inside the scan, so the rejection
    * costs one comparison per interval and names the fix: raise
    * chunkMs toward the typical span, or raise the cap consciously). */
  def rangeJoin(points: DataFrame, ptCol: String, intervals: DataFrame,
      chunkMs: Long, maxChunksPerInterval: Long = 65536L): DataFrame = {
    val startChunk = msBucket(col("start_ms"), chunkMs)
    val endChunk = msBucket(col("end_ms") - 1L, chunkMs)
    val spanChunks = endChunk - startChunk + 1L
    val ivc = intervals
      .filter(col("end_ms") > col("start_ms"))
      .withColumn("chunk", explode(
        when(spanChunks > maxChunksPerInterval,
          raise_error(format_string(
            "graft rangeJoin: interval [%d, %d) spans %d chunks of " +
              s"$chunkMs ms (cap $maxChunksPerInterval) — raise chunkMs " +
              "toward the typical interval length, or raise " +
              "maxChunksPerInterval if the explode factor is intended",
            col("start_ms"), col("end_ms"), spanChunks)))
          .otherwise(sequence(startChunk, endChunk))))
    points
      .withColumn("chunk", msBucket(col(ptCol), chunkMs))
      .join(ivc, "chunk")
      .filter(col(ptCol) >= col("start_ms") && col(ptCol) < col("end_ms"))
      .drop("chunk")
  }

  /** The range-join query shape: every `every`-th event opens a
    * `spanMs` window; count the events landing in each window. The
    * interval side is Catalyst-size-gated to a broadcast here (few
    * intervals); with a billion intervals the same plan shuffles both
    * sides on the chunk key. */
  def rangeJoinEvents(t: Tables, spanMs: Long = 3600000L,
      every: Long = 100L, chunkMs: Long = 3600000L): DataFrame = {
    val ms = withMs(t)
    val intervals = ms.filter(col("event_id") % every === 0L)
      .select(col("event_id").as("iv_id"),
        col("ts_ms").as("start_ms"),
        (col("ts_ms") + spanMs).as("end_ms"))
    val points = ms.select(col("event_id"), col("ts_ms").as("pt"))
    rangeJoin(points, "pt", intervals, chunkMs)
      .groupBy("iv_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"))
      .orderBy("iv_id")
  }

  /** B26 — ordered FUNNEL analysis: per user, the earliest time each
    * funnel stage was reached IN ORDER (an event at stage i+1 before
    * the first qualifying stage-i time doesn't count) — the
    * product-analytics query every event consumer's downstream
    * eventually runs, and the batch form of a stage-ordered session
    * pattern match. Generalized to an ARBITRARY stage list (round 13 —
    * real funnels are N-step): the sequential-min recurrence
    * t1 = min ts of stage 1; t_{i+1} = min ts of stage i+1 with
    * ts >= t_i folds over the stage list. All comparisons are exact
    * epoch-ms int64 — no float, no approximation — so stage times and
    * counts are hash-exact at any N.
    *
    * Scale shape: ONE user_id exchange however many stages. The N
    * stage minima are whole-partition window aggregates over the SAME
    * partitioning (zero inter-stage exchanges — each references the
    * previous stage's column), and the final per-user collapse reuses
    * that partitioning (exchange-elimination), so a 100 TB event log
    * flows through exactly one shuffle carrying (user_id, type,
    * ts_ms). No per-user sort is needed for the unordered frames
    * beyond the window operator's partition clustering. */
  def funnelStages(t: Tables,
      stages: Seq[String] = Seq("signup", "view", "click", "purchase")): DataFrame =
    funnelStagesOf(
      withMs(t).select(col("user_id"), col("event_type"), col("ts_ms")),
      stages)

  /** Library form over any (user_id, event_type, ts_ms) frame; emits
    * one `<stage>_ms` column per stage, the reached-stage count, and
    * first-to-last conversion time. */
  def funnelStagesOf(e: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "a funnel needs at least two stages")
    require(stages.distinct.length == stages.length,
      "funnel stages must be distinct event types")
    val n = stages.length
    val w = Window.partitionBy("user_id")
    // t1 .. tN by the sequential-min fold; each window references the
    // previous stage's column, so all N share one partitioning
    val staged = stages.zipWithIndex.foldLeft(e) { case (df, (st, i)) =>
      val hit = if (i == 0) col("event_type") === st
        else col("event_type") === st && col("ts_ms") >= col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(hit, col("ts_ms"))).over(w))
    }
    val stageAggs = stages.zipWithIndex.map { case (st, i) =>
      max(col(s"t${i + 1}")).as(s"${st}_ms") }
    // forward fold nests earlier stages under later ones, so the
    // deepest reached stage is checked first
    val stageNo = stages.indices.foldLeft(lit(0L)) { case (els, i) =>
      when(col(s"${stages(i)}_ms").isNotNull, (i + 1).toLong).otherwise(els) }
    staged.groupBy("user_id")
      .agg(stageAggs.head, stageAggs.tail: _*)
      .withColumn("stage", stageNo)
      .withColumn("ms_to_convert",
        col(s"${stages(n - 1)}_ms") - col(s"${stages.head}_ms"))
      .orderBy("user_id")
  }

  /** B27 — cohort RETENTION analysis: users are cohorted by their
    * first-active day; each (cohort_day, offset_days) cell counts how
    * many of that cohort were active again offset days later, plus the
    * exact per-mille retention rate. The standard product-analytics
    * companion of B26's funnel (parser.py's consumers feed exactly this
    * kind of downstream), all in exact epoch-day int64 arithmetic.
    *
    * Scale shape: ONE event-scale exchange. The per-user groupBy
    * partial-aggregates map-side — collect_set(day) is bounded by
    * calendar days, never event count, so the exchange carries one
    * (user_id, min_day, day_set) row per user per map task. The
    * exploded (cohort, offset) cell agg partial-counts map-side too, so
    * its exchange carries per-cell partials (≤ days² rows). Cohort
    * sizes come from the offset-0 cells via a window over the tiny cell
    * table — no second scan, no join back to events. */
  def cohortRetention(t: Tables): DataFrame =
    cohortRetentionOf(withMs(t)
      .select(col("user_id"), intDiv(col("ts_ms"), 86400000L).as("day")))

  /** Library form over any (user_id, day) activity frame. */
  def cohortRetentionOf(e: DataFrame): DataFrame =
    cohortCellsOf(cohortDaySets(e))

  /** The per-user (cohort_day, day-set) reduction — every aggregate is
    * ORDER-INDEPENDENT (min, set-union), which is what lets
    * [[graft.streaming.EventStreams.cohortStateStream]] run the same
    * core as an Update-mode streaming aggregation whose end state is
    * exactly the batch frame under ANY arrival order. */
  def cohortDaySets(e: DataFrame): DataFrame =
    e.groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"),
        collect_set(col("day")).as("days"))

  /** Cohort cells from a (user_id, cohort_day, days) frame — the
    * model-sized tail of the pipeline (≤ days² rows at any scale). */
  def cohortCellsOf(perUser: DataFrame): DataFrame = {
    val cells = perUser
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("active_users"))
    // every user is active on their cohort day, so the offset-0 cell IS
    // the cohort size; cells are at most days² rows, so the whole-frame
    // window is model-sized at any event scale
    val w = Window.partitionBy("cohort_day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("cohort_size",
        max(when(col("offset_days") === 0L, col("active_users"))).over(w))
      .withColumn("retained_pm",
        call_function("div", col("active_users") * 1000L, col("cohort_size")))
      .orderBy("cohort_day", "offset_days")
  }
}
