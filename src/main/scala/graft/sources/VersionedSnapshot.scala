package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** H16 — SNAPSHOT TIME TRAVEL: version manifests over [[Snapshot]]'s
  * hash-bucketed layout (round 14; the natural completion of the
  * lakehouse trio — H13 merge, H13b versioned CDC apply, H14
  * compaction), the Delta/Iceberg `VERSION AS OF` read re-expressed as
  * plain parquet + a manifest directory.
  *
  * Why [[Snapshot.mergeCdc]] alone cannot time-travel: dynamic
  * partition overwrite REPLACES the touched buckets' files, so history
  * is physically gone the moment a merge lands. The versioned table is
  * therefore COPY-ON-WRITE:
  *
  *   - `data/v=N/bucket=B/` — immutable parquet written by commit N;
  *     a commit writes ONLY the buckets it touched, never rewrites or
  *     deletes an earlier commit's files.
  *   - `_manifests/vN.manifest` — the table AT version N as a
  *     (bucket → commit) map: which commit's directory holds each
  *     bucket's current rows. Bucket-count-sized (≤ `buckets` lines),
  *     written to a temp name and atomically renamed (the [[Compaction]]
  *     redo-marker rule: a half-written manifest must never be a
  *     readable version).
  *
  * A commit = data first, manifest rename last — a crash anywhere
  * leaves an orphan `data/v=N` directory that the retried commit
  * overwrites, never a visible half-version. Reading AS OF v groups the
  * manifest by commit and unions one partition-pruned scan per commit
  * — no shuffle, file-level pruning, manifests never touch row data.
  *
  * Change application is [[Snapshot.mergeCdc]]'s versioned tombstone
  * discipline verbatim: a change applies only at `ver` >= the stored
  * version, deletes write tombstones, so out-of-order and replayed
  * batches converge — and EVERY historical version keeps its own view
  * of the tombstones (the as-of-after-delete spec).
  *
  * Scale shape: per-commit cost ∝ touched partitions (the H13 claim,
  * now with history); per-read cost ∝ the buckets actually scanned
  * (partition pruning inside each commit branch); manifest IO is
  * bucket-count-sized driver work. [[compactVersions]] is the
  * file-count maintenance loop: folds the CURRENT version's buckets
  * into one fresh commit and publishes it as a new version — prior
  * manifests keep pointing at the old directories, so every historical
  * read is byte-identical before and after (spec-pinned);
  * [[vacuum]] is the retention step that finally deletes data
  * directories no retained manifest references.
  *
  * Ref: no analog in SergiyStoyan/AwsKinesisConsumer (the consumer
  * keeps only newest-N frames, parser.py:470-481); this is the archive
  * counterpart its downstream store would need for reproducible
  * training-data snapshots ("train on the corpus exactly as it stood
  * on date D").
  */
object VersionedSnapshot {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(path: String, v: Long) =
    new Path(path, f"_manifests/v$v%06d.manifest")

  /** Largest published version, or -1 for an uninitialized table. */
  def currentVersion(spark: SparkSession, path: String): Long = {
    val dir = new Path(path, "_manifests")
    val fs = fsOf(spark, path)
    if (!fs.exists(dir)) return -1L
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      .foldLeft(-1L)(math.max)
  }

  private def readManifest(spark: SparkSession, path: String,
      v: Long): Map[Long, Long] = {
    val fs = fsOf(spark, path)
    val p = manifestPath(path, v)
    require(fs.exists(p), s"no version $v at $path (manifest missing)")
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
    lines.map { l =>
      val Array(b, c) = l.split("=", 2); b.toLong -> c.toLong
    }.toMap
  }

  /** Publish manifest `v`: temp write + atomic rename (all-or-nothing —
    * a reader can never observe a truncated bucket map). */
  private def writeManifest(spark: SparkSession, path: String, v: Long,
      entries: Map[Long, Long]): Unit = {
    val fs = fsOf(spark, path)
    val target = manifestPath(path, v)
    fs.mkdirs(target.getParent)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(entries.toSeq.sorted.map { case (b, c) => s"$b=$c" }
      .mkString("\n").getBytes("UTF-8"))
    out.close()
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"could not publish manifest $target")
  }

  /** Initialize version 0 from a (key, payload) frame: rows stored in
    * the CDC layout (ver struct + tombstone flag) so later
    * [[applyChanges]] commits compose. `ver` must be present (the
    * initial load's version column, e.g. struct(ts_ms, id)). */
  def init(df: DataFrame, keyCol: String, path: String,
      buckets: Int = Snapshot.DefaultBuckets): Long = {
    val spark = df.sparkSession
    graft.plans.VectorFunctions.register(spark)
    require(currentVersion(spark, path) < 0L,
      s"$path is already a versioned snapshot")
    val withB = df
      .withColumn("deleted", lit(false))
      .withColumn("bucket", Snapshot.bucketOf(col(keyCol), buckets))
    withB.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data/v=0")
    val present = withB.select("bucket").distinct()
      .collect().map(_.getLong(0))
    writeManifest(spark, path, 0L, present.map(_ -> 0L).toMap)
    0L
  }

  /** Apply one CDC batch as a NEW VERSION (copy-on-write
    * [[Snapshot.mergeCdc]]): `changes` carries keyCol, an orderable
    * `ver`, `op` ("U"/"D"), and payload. Touched buckets are rewritten
    * into `data/v=<new>`; untouched buckets keep their manifest entry —
    * their files are not opened, let alone rewritten. Returns the new
    * version. Replay-safe: a crashed commit never published its
    * manifest, and the retry overwrites the orphan data directory. */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
      keyCol: String, buckets: Int = Snapshot.DefaultBuckets): Long = {
    graft.plans.VectorFunctions.register(spark)
    // foreachBatch frames analyze against a cloned session state (the
    // Snapshot.merge rule): register the kernels on the frame's session
    graft.plans.VectorFunctions.register(changes.sparkSession)
    val cur = currentVersion(spark, path)
    require(cur >= 0L, s"$path is not initialized (call init first)")
    val manifest = readManifest(spark, path, cur)
    val payloadCols = changes.columns.filterNot(
      c => c == keyCol || c == "ver" || c == "op").toSeq
    // within-batch winner per key — the B23 max-struct election
    // (ver leads the ordering and is unique per change)
    val winner = changes
      .select(col(keyCol), struct(
        (col("ver") +: col("op") +: payloadCols.map(col)): _*).as("w"))
      .groupBy(keyCol).agg(max(col("w")).as("w"))
      .select(col(keyCol) +: col("w.ver").as("ver") +:
        col("w.op").as("op") +: payloadCols.map(c => col(s"w.$c").as(c)): _*)
    val bb = winner.withColumn("bucket",
      Snapshot.bucketOf(col(keyCol), buckets))
    val touched = bb.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return cur
    def stored(deleted: org.apache.spark.sql.Column) = struct(
      (col("ver") +: payloadCols.map(col)) :+ deleted.as("deleted") :+
        col("bucket"): _*)
    val chg = bb.select(col(keyCol), stored(col("op") === "D").as("c"))
    // base side: the touched buckets as of `cur`, one pruned scan per
    // commit directory that still holds one of them
    val baseBranches = manifest.filter(t => touched(t._1)).toSeq
      .groupBy(_._2).toSeq.map { case (commit, entries) =>
        spark.read.parquet(s"$path/data/v=$commit")
          .filter(col("bucket").isin(entries.map(_._1): _*))
      }
    val joined = baseBranches.reduceOption(_ unionByName _) match {
      case Some(base) =>
        base.select(col(keyCol), stored(col("deleted")).as("b"))
          .join(chg, Seq(keyCol), "full_outer")
      case None =>
        chg.withColumn("b", lit(null).cast(chg.schema("c").dataType))
    }
    val picked = when(col("c").isNull, col("b"))
      .when(col("b").isNull, col("c"))
      .when(col("c.ver") >= col("b.ver"), col("c"))
      .otherwise(col("b"))
    val merged = joined.select(col(keyCol), picked.as("st"))
      .select(col(keyCol), col("st.*"))
    val next = cur + 1L
    merged.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data/v=$next")
    writeManifest(spark, path, next,
      manifest ++ touched.map(_ -> next))
    next
  }

  /** The table AS OF `version`, tombstones and layout included: one
    * partition-pruned scan per commit the manifest references, no
    * shuffle. */
  def readAsOf(spark: SparkSession, path: String, version: Long): DataFrame = {
    val manifest = readManifest(spark, path, version)
    val branches = manifest.toSeq.groupBy(_._2).toSeq
      .sortBy(_._1).map { case (commit, entries) =>
        spark.read.parquet(s"$path/data/v=$commit")
          .filter(col("bucket").isin(entries.map(_._1): _*))
      }
    branches.reduceOption(_ unionByName _)
      .getOrElse(throw new IllegalArgumentException(
        s"version $version of $path maps no buckets"))
  }

  /** The LIVE rows as of `version` (tombstones and layout dropped) —
    * the user-facing `SELECT * FROM t VERSION AS OF v`. */
  def readLiveAsOf(spark: SparkSession, path: String,
      version: Long): DataFrame =
    readAsOf(spark, path, version).filter(!col("deleted"))
      .drop("deleted", "bucket")

  /** File-count maintenance: fold the CURRENT version's buckets into a
    * single fresh commit and publish it as a new version with identical
    * logical content. Prior manifests keep referencing the old
    * directories — every historical read is byte-identical before and
    * after (the compaction-preserves-versions spec). */
  def compactVersions(spark: SparkSession, path: String): Long = {
    val cur = currentVersion(spark, path)
    require(cur >= 0L, s"$path is not initialized")
    val next = cur + 1L
    val all = readAsOf(spark, path, cur)
    all.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/data/v=$next")
    writeManifest(spark, path, next,
      readManifest(spark, path, cur).keySet.map(_ -> next).toMap)
    next
  }

  /** Retention: drop manifests OLDER than `retainFrom` and delete every
    * `data/v=` directory no surviving manifest references. The
    * time-travel window becomes [retainFrom, current]. */
  def vacuum(spark: SparkSession, path: String, retainFrom: Long): Unit = {
    val fs = fsOf(spark, path)
    val cur = currentVersion(spark, path)
    require(retainFrom <= cur, s"retainFrom $retainFrom > current $cur")
    val versions = (0L to cur).filter(v =>
      fs.exists(manifestPath(path, v)))
    val (drop, keep) = versions.partition(_ < retainFrom)
    val referenced = keep.flatMap(v =>
      readManifest(spark, path, v).values).toSet
    drop.foreach(v => fs.delete(manifestPath(path, v), false))
    val dataDir = new Path(path, "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => p.getName.startsWith("v=") &&
          !referenced(p.getName.stripPrefix("v=").toLong))
        .foreach(fs.delete(_, true))
    }
  }

  /** The [Q:snapshot_time_travel] fixture: the merge_cdc changelog
    * (events keyed by user_id, ver = (ts_ms, event_id), op = D on
    * 'error') applied in the SAME out-of-order batch sequence
    * (event_id % 4 slices 3 → 1 → 0 → 2), each as one published
    * version — then read back AS OF version 2, i.e. the table as it
    * stood when only slices {3, 1} had landed, AFTER versions 3 and 4
    * exist. The oracle replays the latest-wins election restricted to
    * those two slices, so the hash gate proves historical reads are
    * insulated from later commits — including later deletes and later
    * re-upserts (slice 0/2 rows are invisible however they interleave).
    * History builds once (marker-gated); the benched query is the
    * manifest-driven pruned read, which is the feature. */
  def timeTravelQuery(t: Tables, sfDir: String): DataFrame = {
    val spark = t.events.sparkSession
    val changes = t.events
      .withColumn("ts_ms", graft.functions.nanosToMs(col("ts")))
      .select(col("user_id"),
        struct(col("ts_ms"), col("event_id")).as("ver"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type").as("typ"),
        graft.functions.cents(col("value")).as("value_c"),
        col("event_id"))
    val out = new Path(System.getProperty("java.io.tmpdir"),
      s"graft_tt_snapshot_v1_b${Snapshot.DefaultBuckets}" +
        s"_${math.abs(sfDir.hashCode)}")
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    // in-snapshot marker (the mergeCdcQuery rule): underscore files are
    // invisible to parquet reads and live inside the dir they gate
    val marker = new Path(out, "_SEEDED")
    if (!fs.exists(marker)) {
      fs.delete(out, true)
      def slice(i: Int) = changes.filter(col("event_id") % 4 === i)
        .drop("event_id")
      // v0 = empty init (schema from the changelog payload), then one
      // version per applied slice: v1={3}, v2={3,1}, v3+={0}, v4+={2}
      init(slice(3).filter(lit(false)).drop("op"), "user_id", out.toString)
      for (i <- Seq(3, 1, 0, 2)) applyChanges(spark, out.toString,
        slice(i), "user_id")
      fs.create(marker, true).close()
    }
    readLiveAsOf(spark, out.toString, 2L)
      .select(col("user_id"), col("ver.event_id").as("last_event_id"),
        col("ver.ts_ms").as("last_ms"), col("typ").as("last_type"),
        col("value_c").as("last_value_c"))
      .orderBy("user_id")
  }
}
