package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Hashing

/** H13 MERGE upsert: content semantics, touched-partition-only rewrite,
  * empty-bucket sweep, replay idempotency. The oracle query
  * (merge_upsert) pins the full-state content at sf0.01; these pin the
  * STORAGE behavior — which partitions a merge may touch. */
class SnapshotSpec extends SparkSpec {

  private val B = Snapshot.DefaultBuckets
  private def bucket(k: Long): Long = {
    val m = Hashing.mix64(k) % B
    if (m < 0) m + B else m
  }

  private def freshDir(): String =
    Files.createTempDirectory("graft_snapshot_spec").toString + "/snap"

  private def baseDf(keys: Seq[Long]) = {
    import spark.implicits._
    keys.map(k => (k, s"v$k")).toDF("k", "payload")
  }

  test("merge applies upsert/insert/delete and is replay-idempotent") {
    import spark.implicits._
    val dir = freshDir()
    Snapshot.writeBase(baseDf(1L to 20L), "k", dir)
    val batch = Seq(
      (3L, "v3-new", "U"),   // replace
      (100L, "v100", "U"),   // insert (new key)
      (7L, null.asInstanceOf[String], "D") // delete
    ).toDF("k", "payload", "op")
    Snapshot.merge(spark, dir, batch, "k")
    val expect = ((1L to 20L).filterNot(_ == 7L).map(k =>
      k -> (if (k == 3L) "v3-new" else s"v$k")) :+ (100L -> "v100")).toMap
    def state() = Snapshot.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state() == expect)
    // replay: merging the same batch into the merged state is a no-op
    Snapshot.merge(spark, dir, batch, "k")
    assert(state() == expect)
  }

  test("untouched partitions are neither rewritten nor scanned (touched-only contract)") {
    import spark.implicits._
    val dir = freshDir()
    val keys = (1L to 200L)
    Snapshot.writeBase(baseDf(keys), "k", dir)
    // a single-key batch touches exactly one bucket
    val k0 = 5L
    val batch = Seq((k0, "changed", "U")).toDF("k", "payload", "op")
    val touchedBucket = bucket(k0)
    def partFiles(b: Long): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/bucket=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSet
    }
    val before = (0L until B).map(b => b -> partFiles(b)).toMap
    // the scan the merge builds prunes at the partition level
    graft.plans.VectorFunctions.register(spark)
    val prunedPlan = spark.read.parquet(dir)
      .filter(col("bucket").isin(touchedBucket))
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters"),
      s"bucket filter did not reach PartitionFilters:\n$prunedPlan")
    Snapshot.merge(spark, dir, batch, "k")
    val after = (0L until B).map(b => b -> partFiles(b)).toMap
    for (b <- 0L until B if b != touchedBucket)
      assert(after(b) == before(b), s"untouched bucket $b was rewritten")
    assert(after(touchedBucket) != before(touchedBucket),
      "touched bucket was not rewritten")
    // and the content survived intact
    val got = Snapshot.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(k0) == "changed" && got.size == keys.size)
  }

  test("a bucket whose rows are all deleted is swept (dynamic overwrite writes nothing there)") {
    import spark.implicits._
    val dir = freshDir()
    // find a bucket with few keys among 1..40, delete ALL of them
    val keys = (1L to 40L)
    val byBucket = keys.groupBy(bucket)
    val (victim, victimKeys) = byBucket.minBy(_._2.size)
    Snapshot.writeBase(baseDf(keys), "k", dir)
    val batch = victimKeys.map(k => (k, null.asInstanceOf[String], "D"))
      .toDF("k", "payload", "op")
    Snapshot.merge(spark, dir, batch, "k")
    assert(!new java.io.File(s"$dir/bucket=$victim").exists(),
      s"emptied bucket $victim still has files")
    val got = Snapshot.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == keys.toSet -- victimKeys)
  }
}
