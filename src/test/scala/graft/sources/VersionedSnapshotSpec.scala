package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedSnapshotSpec extends SparkSpec {

  private def ver(ts: Long, id: Long) = struct(lit(ts).as("ts_ms"),
    lit(id).as("event_id"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("vsnap").toString + "/t"

  private def liveMap(path: String, v: Long): Map[Long, (String, Long)] =
    VersionedSnapshot.readLiveAsOf(spark, path, v)
      .select(col("k"), col("typ"), col("ver.event_id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  private def batch(rows: Seq[(Long, Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("k", "ts_ms", "event_id", "op", "typ")
      .select(col("k"), struct(col("ts_ms"), col("event_id")).as("ver"),
        col("op"), col("typ"))
  }

  test("as-of reads reconstruct every historical state, incl. after-delete and stale-upsert insulation") {
    import spark.implicits._
    val dir = freshDir()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "typ")
      .withColumn("ver", ver(0L, 0L))
      .select("k", "ver", "typ")
    assert(VersionedSnapshot.init(base, "k", dir) == 0L)
    // v1: update k=1, insert k=4
    val v1 = VersionedSnapshot.applyChanges(spark, dir,
      batch(Seq((1L, 10L, 1L, "U", "a2"), (4L, 10L, 2L, "U", "d"))), "k")
    assert(v1 == 1L)
    // v2: DELETE k=2
    val v2 = VersionedSnapshot.applyChanges(spark, dir,
      batch(Seq((2L, 20L, 3L, "D", "x"))), "k")
    // v3: an OUT-OF-ORDER older upsert for k=2 (ver 15 < the delete's
    // 20) — must NOT resurrect the tombstone; plus a fresh k=5
    val v3 = VersionedSnapshot.applyChanges(spark, dir,
      batch(Seq((2L, 15L, 4L, "U", "zombie"), (5L, 30L, 5L, "U", "e"))), "k")
    assert(liveMap(dir, 0L).keySet == Set(1L, 2L, 3L))
    assert(liveMap(dir, v1) ==
      Map(1L -> ("a2", 1L), 2L -> ("b", 0L), 3L -> ("c", 0L), 4L -> ("d", 2L)))
    // as-of-after-delete: v2 lacks k=2, v1 still HAS it
    assert(!liveMap(dir, v2).contains(2L))
    assert(liveMap(dir, v1).contains(2L))
    // the stale upsert stayed dead at v3; k=5 arrived
    val m3 = liveMap(dir, v3)
    assert(!m3.contains(2L) && m3(5L) == ("e", 5L))
    // and the tombstone is PRESENT in the raw as-of view with deleted=true
    val raw3 = VersionedSnapshot.readAsOf(spark, dir, v3)
      .filter(col("k") === 2L).select("deleted").collect()
    assert(raw3.map(_.getBoolean(0)).toSeq == Seq(true))
  }

  test("a commit writes ONLY its touched buckets; untouched data directories stay byte-identical") {
    import spark.implicits._
    val dir = freshDir()
    // 64 keys spread across the 16 buckets
    val base = (1L to 64L).map(k => (k, s"t$k")).toDF("k", "typ")
      .withColumn("ver", ver(0L, 0L)).select("k", "ver", "typ")
    VersionedSnapshot.init(base, "k", dir)
    val v1 = VersionedSnapshot.applyChanges(spark, dir,
      batch(Seq((7L, 10L, 1L, "U", "u7"))), "k")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the new commit dir holds exactly ONE bucket= subdirectory — the
    // one key 7 hashes to; the copy-on-write claim, structurally
    val commitBuckets = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/data/v=$v1"))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("bucket="))
    assert(commitBuckets.length == 1, commitBuckets.toSeq.toString)
    // v=0's files were not touched (no rewrite, no delete)
    val v0files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data/v=0"))
    assert(v0files.nonEmpty)
  }

  test("compaction preserves every historical version and the current content; vacuum trims the window") {
    import spark.implicits._
    val dir = freshDir()
    val base = (1L to 20L).map(k => (k, s"t$k")).toDF("k", "typ")
      .withColumn("ver", ver(0L, 0L)).select("k", "ver", "typ")
    VersionedSnapshot.init(base, "k", dir)
    VersionedSnapshot.applyChanges(spark, dir,
      batch(Seq((3L, 10L, 1L, "U", "u3"), (21L, 10L, 2L, "U", "n21"))), "k")
    val v2 = VersionedSnapshot.applyChanges(spark, dir,
      batch(Seq((5L, 20L, 3L, "D", "x"))), "k")
    val before = (0L to v2).map(v => v -> liveMap(dir, v)).toMap
    val vc = VersionedSnapshot.compactVersions(spark, dir)
    assert(vc == v2 + 1)
    // every prior version reads identically, and the compacted version
    // equals the pre-compact current state
    (0L to v2).foreach(v => assert(liveMap(dir, v) == before(v),
      s"version $v changed under compaction"))
    assert(liveMap(dir, vc) == before(v2))
    // the compacted commit references ONLY its own directory
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // vacuum to [v2, vc]: v0/v1 manifests go, and after the compact
    // nothing references data/v=0 or v=1 anymore — both are swept
    VersionedSnapshot.vacuum(spark, dir, retainFrom = v2)
    intercept[IllegalArgumentException] {
      VersionedSnapshot.readLiveAsOf(spark, dir, 0L).collect()
    }
    assert(liveMap(dir, v2) == before(v2)) // retained window intact
    assert(liveMap(dir, vc) == before(v2))
    // strict retention check: a data dir survives iff some RETAINED
    // manifest (v2 or vc) maps a bucket to it — v2 still references the
    // v=1 and v=2 commit dirs it was built from, so they stay; anything
    // only version 0/1-manifests referenced is swept
    val kept = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    val refCommits = Seq(v2, vc).flatMap { v =>
      val p = new org.apache.hadoop.fs.Path(dir,
        f"_manifests/v$v%06d.manifest")
      val in = fs.open(p)
      val lines = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      in.close()
      lines.map(_.split("=")(1).toLong)
    }.toSet
    assert(kept == refCommits.map(c => s"v=$c"),
      s"kept $kept != referenced $refCommits")
  }

  test("replaying a batch converges: re-applying produces a new version with identical content") {
    import spark.implicits._
    val dir = freshDir()
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "typ")
      .withColumn("ver", ver(0L, 0L)).select("k", "ver", "typ")
    VersionedSnapshot.init(base, "k", dir)
    val b = batch(Seq((1L, 10L, 1L, "U", "a2"), (2L, 10L, 2L, "D", "x")))
    val v1 = VersionedSnapshot.applyChanges(spark, dir, b, "k")
    val v2 = VersionedSnapshot.applyChanges(spark, dir, b, "k")
    assert(liveMap(dir, v1) == liveMap(dir, v2))
    assert(liveMap(dir, v2) == Map(1L -> ("a2", 1L)))
  }
}
