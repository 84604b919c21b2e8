package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Persisted FRAME-signature index — the multimodal twin of
  * [[TextIndex]] (text) and [[VectorIndex.curateStream]] (embeddings),
  * completing the incremental-curation story for the third modality
  * (SURVEY §2 G7): the G6 perceptual-dedup state as a durable
  * artifact, so a NEW batch of media frames dedups against the settled
  * library by probing stored dHash bands instead of re-decoding 100 TB
  * of settled media per run — the continuous-consumer shape of the
  * reference (parser.py:272-310 never re-reads settled fragments).
  *
  * Artifact layout under `dir`:
  *   - `bands/` — (frame_id, sig, k, cv): each frame's 64-bit dHash
  *     exploded over the 7 pigeonhole bands of
  *     [[Dedup.simhashBandLayout]] (complete for Hamming <= 6),
  *     partitioned by (ingest_batch, cb = cv mod [[Buckets]]). No
  *     frame bytes are ever stored — the index is ids + signatures,
  *     ~60 B/frame/band against megabyte media payloads.
  *
  * `ingest_batch` is the idempotency key ([[TextIndex]] discipline):
  * replayed micro-batches dynamic-overwrite exactly their own
  * partitions, and the cb bucket key keeps files block-sized and gives
  * the probe join a dynamic-partition-pruning handle.
  */
object FrameIndex {

  val BaseBatch = -1L
  val Buckets = 16

  /** Banded signature rows of a (frame_id, frame) table: decode →
    * dHash → 7-band explode (the G6 pipeline's signature half). A
    * frame the decoder rejects (null features) is skipped — it cannot
    * perceptually duplicate anything. */
  private def signatures(frames: DataFrame): DataFrame = {
    graft.plans.VectorFunctions.register(frames.sparkSession)
    val bands = array(Dedup.simhashBandLayout.zipWithIndex.map { case ((off, w), k) =>
      struct(lit(k).as("k"),
        call_function("shiftright", col("sig"), lit(off))
          .bitwiseAND(lit((1L << w) - 1L)).as("cv"))
    }: _*)
    frames
      .select(col("frame_id"),
        call_function("graft_bmp_features", col("frame"))
          .getField("dhash").as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("frame_id"), col("sig"), explode(bands).as("c"))
      .select(col("frame_id"), col("sig"), col("c.k").as("k"),
        col("c.cv").as("cv"), pmod(col("cv"), lit(Buckets.toLong)).as("cb"))
  }

  private def writeBands(sigs: DataFrame, dir: String, ingestBatch: Long,
      mode: String, dynamic: Boolean): Unit = {
    val spark = sigs.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    if (dynamic)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sigs.withColumn("ingest_batch", lit(ingestBatch))
      .repartition(col("cb"))
      .write.mode(mode).partitionBy("ingest_batch", "cb")
      .parquet(s"$dir/bands")
    finally if (dynamic) prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Build the index from the settled frame library (static overwrite). */
  def build(frames: DataFrame, dir: String): Unit =
    writeBands(signatures(frames), dir, BaseBatch, "overwrite", dynamic = false)

  /** One micro-batch of index maintenance, IDEMPOTENTLY: dynamic
    * partition overwrite keyed by (ingest_batch, cb) — a replayed
    * batch replaces exactly its own partitions (the B19 rule). */
  def appendBatch(frames: DataFrame, batchId: Long, dir: String): Unit =
    writeBands(signatures(frames), dir, batchId, "overwrite", dynamic = true)

  /** Near-dup pairs of an ingest batch against the index (and itself)
    * WITHOUT re-decoding settled media. Output (id_a < id_b, hamming):
    * exactly the [[Multimodal.mmFrameDedup]] pairs over the full
    * library that involve >= 1 batch frame (FrameIndexSpec pins the
    * equality; the DuckDB oracle replays both tiers).
    *
    * Scale shape: batch signatures are computed once (localCheckpoint —
    * the returned plan contains NO scan of the batch's media source),
    * then one band-bucket probe join against the index plus the
    * within-batch band join; both exchanges are ids+signatures wide,
    * never media bytes. `excludeBatch` drops one ingest partition at
    * planning time (partition-column filter) — the crash-replay guard
    * [[curateStream]] passes so a replayed batch never probes its own
    * signatures. */
  def dedupBatch(newFrames: DataFrame, dir: String,
      excludeBatch: Option[Long] = None, maxHamming: Int = 6): DataFrame =
    dedupBatchFrom(signatures(newFrames).localCheckpoint(true), dir,
      excludeBatch, maxHamming)

  private def dedupBatchFrom(bSigs: DataFrame, dir: String,
      excludeBatch: Option[Long], maxHamming: Int): DataFrame = {
    val spark = bSigs.sparkSession
    val idx = {
      val df = spark.read.parquet(s"$dir/bands")
      excludeBatch.fold(df)(b => df.filter(col("ingest_batch") =!= b))
    }
    val within = bSigs.as("a").join(bSigs.as("b"),
        col("a.k") === col("b.k") && col("a.cv") === col("b.cv") &&
          col("a.frame_id") < col("b.frame_id"))
      .select(col("a.frame_id").as("id_a"), col("b.frame_id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
    // batch × settled: the cb equality is implied by cv equality — it
    // exists purely as the dynamic-partition-pruning handle on the
    // index scan
    val cross = bSigs.as("x").join(idx.as("y"),
        col("x.k") === col("y.k") && col("x.cv") === col("y.cv") &&
          col("y.cb") === pmod(col("x.cv"), lit(Buckets.toLong)) &&
          col("x.frame_id") =!= col("y.frame_id"))
      .select(least(col("x.frame_id"), col("y.frame_id")).as("id_a"),
        greatest(col("x.frame_id"), col("y.frame_id")).as("id_b"),
        when(col("x.frame_id") < col("y.frame_id"), col("x.sig"))
          .otherwise(col("y.sig")).as("sig_a"),
        when(col("x.frame_id") < col("y.frame_id"), col("y.sig"))
          .otherwise(col("x.sig")).as("sig_b"))
    within.unionByName(cross)
      .distinct() // multi-band agreements emit once
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** The curation-gate keeper rule ([[TextIndex.curateKeepers]]'s,
    * applied to frames): a batch frame is DROPPED iff it is the larger
    * id of a pair whose other side is also in the batch (min-id
    * representative survives), or EITHER side of a pair whose other
    * side is settled — the settled copy wins at any id, because it
    * cannot be unshipped at ingest time. */
  def curateKeepers(batch: DataFrame, dir: String,
      excludeBatch: Option[Long] = None, maxHamming: Int = 6): DataFrame = {
    val bSigs = signatures(batch).localCheckpoint(true)
    // size the probe join's reducer width from the settled index bytes
    // ([[TextIndex.curateKeepers]]'s rule — identical probe shape, same
    // constant-width OOM class at corpus scale; floors to the session
    // width at bench SF)
    val spark = batch.sparkSession
    val pairs = Dedup.withInitialPartitions(spark,
        Dedup.sizedShufflePartitions(spark,
          TextIndex.indexBytes(spark, dir))) {
      val p0 = dedupBatchFrom(bSigs, dir, excludeBatch, maxHamming)
      graft.tools.StagePlans.record(p0, "frame_curate/index_probe")
      p0.localCheckpoint(true) // candidate-sized; feeds two branches
    }
    val batchIds = batch.select(col("frame_id"))
    val asB = pairs.select(col("id_b").as("frame_id"))
    val asA = pairs
      .join(batchIds.withColumnRenamed("frame_id", "id_b"), Seq("id_b"),
        "left_anti")
      .select(col("id_a").as("frame_id"))
    batch.join(asB.unionByName(asA).distinct(), Seq("frame_id"), "left_anti")
  }

  /** G7b — the CONTINUOUS frame-curation gate: probe the settled index,
    * keep the novel frames, index the batch — one resumable streaming
    * query (the D7b loop for the frame modality). Per micro-batch:
    *   1. [[curateKeepers]] probes the index EXCLUDING the batch's own
    *      ingest partition (crash-replay guard);
    *   2. keeper ids persist by dynamic partition overwrite keyed on
    *      the batch id (B19 idempotent persist);
    *   3. [[appendBatch]] indexes the FULL batch — keepers and dropped
    *      frames alike, so a later near-dup of a dropped frame is
    *      still caught.
    * Every step is a deterministic function of (index minus own
    * partition, batch content) and overwrites only its own partitions,
    * so a crash anywhere replays to identical keepers and an identical
    * index. Concurrent streams namespace their batch ids exactly as
    * [[VectorIndex.appendStream]] registers run ids. */
  def curateStream(frames: DataFrame, dir: String, keptDir: String,
      checkpointDir: String, maxHamming: Int = 6)
      : org.apache.spark.sql.streaming.StreamingQuery =
    frames.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val keepers = curateKeepers(batch, dir, Some(batchId), maxHamming)
          .select(col("frame_id")).localCheckpoint(true)
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try keepers.withColumn("ingest_batch", lit(batchId))
          .repartition(1)
          .write.mode("overwrite").partitionBy("ingest_batch")
          .parquet(keptDir)
        finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
        appendBatch(batch, batchId, dir)
        ()
      }
      .start()

  /** Fold settled ingest batches into the base partition so directory
    * counts stay bounded under continuous ingest ([[TextIndex.compact]]
    * discipline, single-table form): stage the deduped union (one row
    * per (frame_id, k) — a replayed-then-crashed append leaves copies),
    * dynamic-overwrite the base, then sweep the folded batch
    * directories. A crash between fold and sweep leaves settled rows in
    * both places — visible via [[compactInProgress]], and harmless to
    * the probe, whose distinct() folds duplicate candidates
    * (FrameIndexSpec pins this with the crash seam). */
  def compact(spark: SparkSession, dir: String,
      upToBatch: Long = Long.MaxValue): Unit =
    compactImpl(spark, dir, upToBatch, crashBeforeSweep = false)

  def compactInProgress(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_COMPACT_INPROGRESS")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private[graft] def compactImpl(spark: SparkSession, dir: String,
      upToBatch: Long, crashBeforeSweep: Boolean): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val markerPath = new Path(dir, "_COMPACT_INPROGRESS")
    val markerFs = markerPath.getFileSystem(conf)
    val root = new Path(s"$dir/bands")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    val batchDirs = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("ingest_batch="))
      .filter { p =>
        val id = p.getName.stripPrefix("ingest_batch=").toLong
        id >= 0L && id <= upToBatch
      }
    if (batchDirs.isEmpty) return
    markerFs.create(markerPath, true).close()
    val staging = new Path(s"$dir/bands_compact_staging")
    val settled = col("ingest_batch") === BaseBatch ||
      (col("ingest_batch") >= 0L && col("ingest_batch") <= upToBatch)
    spark.read.parquet(s"$dir/bands")
      .filter(settled)
      .dropDuplicates("frame_id", "k")
      .withColumn("ingest_batch", lit(BaseBatch))
      .write.mode("overwrite").parquet(staging.toString)
    spark.read.parquet(staging.toString)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cb")
      .parquet(s"$dir/bands")
    if (crashBeforeSweep)
      throw new IllegalStateException(
        "simulated compact crash before sweep (test seam)")
    batchDirs.foreach(fs.delete(_, true))
    fs.delete(staging, true)
    markerFs.delete(markerPath, false)
    ()
  }

  /** Build-once cache of the settled sampled-frame index for the
    * oracle queries (the [[TextIndex.materialize]] pattern): settled =
    * sampled frames outside the seq == 6 ingest slice (seq = sample
    * sequence number mod 8; slice 6 keeps frame_id/10 EVEN, so the
    * ingest carries planted family frames — an odd slice would hold
    * only noise frames and the probe would be vacuous); marker-gated,
    * exercises a replayed appendBatch on the seq == 5 slice. */
  def materialize(t: Tables, sfDir: String): String = {
    val spark = t.events.sparkSession
    val out = new Path(System.getProperty("java.io.tmpdir"),
      s"graft_frame_index_v1_b$Buckets" + s"_${math.abs(sfDir.hashCode)}")
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(out, "_INDEX_SUCCESS")
    if (!fs.exists(marker)) {
      fs.delete(out, true)
      val frames = Multimodal.sampledFrames(t)
      val seq = pmod(graft.functions.intDiv(col("frame_id"), 10L), lit(8L))
      build(frames.filter(seq =!= 6L && seq =!= 5L), out.toString)
      val batch = frames.filter(seq === 5L)
      appendBatch(batch, 0L, out.toString)
      appendBatch(batch, 0L, out.toString) // replay: must be a no-op
      compact(spark, out.toString)
      fs.create(marker, true).close()
    }
    out.toString
  }
}
