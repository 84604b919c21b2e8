package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The persisted text-dedup index: incremental batch dedup must be
  * indistinguishable from the full-corpus recompute, replays must be
  * no-ops, compaction must be invisible to probes, and the probe plan
  * must never rescan the settled corpus. */
class TextIndexSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-text-index-spec").toString

  private val isNew = pmod(col("doc_id"), lit(8L)) === 7L

  private def settled: DataFrame = t.documents.filter(!isNew)
  private def batch: DataFrame = t.documents.filter(isNew)

  test("batch dedup equals the full-corpus recompute restricted to new docs") {
    val dir = freshDir()
    TextIndex.build(settled, dir)
    val got = TextIndex.dedupBatch(batch, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    // band rows: the full-corpus candidate set, pairs touching a new doc
    val wantBand = Dedup.minhashCandidates(t)
      .filter(col("id_a") % 8 === 7 || col("id_b") % 8 === 7)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), "band"))
    // exact rows: smallest doc_id per text group, for new docs above it
    val groups = t.documents.groupBy("text")
      .agg(min("doc_id").as("mn"))
    val wantExact = t.documents.filter(isNew).join(groups, "text")
      .filter(col("mn") < col("doc_id"))
      .select(col("mn"), col("doc_id"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), "exact"))

    assert(got.sorted == (wantBand ++ wantExact).sorted,
      s"incremental dedup diverged from the full recompute: " +
        s"got ${got.size} rows, want ${wantBand.size + wantExact.size}")
    // the synthetic corpus has no exact-text duplicates (dedup_exact is
    // all singletons), so the real-data equality exercises the band
    // tier; the exact tier gets its own fixture below
    assert(wantBand.nonEmpty, "fixture must exercise the band tier")
  }

  test("exact tier elects the full-corpus keeper across settled and batch") {
    import spark.implicits._
    val dir = freshDir()
    // texts: A duplicated settled+batch+batch, B batch-only duplicate
    // pair, C unique. Tokens made distinct enough that no band fires.
    def doc(id: Long, text: String) = (id, text)
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val settledDocs = mk(Seq(
      doc(1L, "alpha beta gamma delta epsilon zeta"),
      doc(2L, "one two three four five six seven")))
    val batchDocs = mk(Seq(
      doc(10L, "alpha beta gamma delta epsilon zeta"), // dup of settled 1
      doc(11L, "red orange yellow green blue indigo"),
      doc(12L, "red orange yellow green blue indigo"), // dup of batch 11
      doc(13L, "unique snowflake document here now")))
    TextIndex.build(settledDocs, dir)
    val got = TextIndex.dedupBatch(batchDocs, dir)
      .filter(col("reason") === "exact")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == Set((1L, 10L), (11L, 12L)),
      s"exact tier wrong: $got")
  }

  test("replayed appendBatch is a no-op; compact is probe-invisible") {
    val dir = freshDir()
    TextIndex.build(t.documents.filter(pmod(col("doc_id"), lit(8L)) < 6L), dir)
    val b0 = t.documents.filter(pmod(col("doc_id"), lit(8L)) === 6L)
    TextIndex.appendBatch(b0, 0L, dir)
    val before = TextIndex.dedupBatch(batch, dir).collect().toSeq
    // replay the same micro-batch: dynamic overwrite must replace, not
    // duplicate — row counts and the probe result stay identical
    TextIndex.appendBatch(b0, 0L, dir)
    val hashRows = spark.read.parquet(s"$dir/hashes").count()
    assert(hashRows == t.documents.filter(pmod(col("doc_id"), lit(8L)) < 7L).count(),
      s"replayed appendBatch duplicated hash rows: $hashRows")
    assert(TextIndex.dedupBatch(batch, dir).collect().toSeq == before)
    // compact folds the batch partitions into base, result unchanged
    TextIndex.compact(spark, dir)
    assert(TextIndex.dedupBatch(batch, dir).collect().toSeq == before,
      "compact changed the probe result")
    for (table <- Seq("hashes", "bands")) {
      val dirs = new java.io.File(s"$dir/$table").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ingest_batch="))
      assert(dirs.toSeq == Seq("ingest_batch=-1"),
        s"$table still has unfolded batch dirs: ${dirs.mkString(",")}")
    }
  }

  test("the probe plan never rescans the documents source") {
    val dir = freshDir()
    TextIndex.build(settled, dir)
    val out = TextIndex.dedupBatch(batch, dir)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"dedupBatch plan rescans the corpus:\n$plan")
    // and no exchange ever carries text: the only columns wider than a
    // hash are the 4-long sigs arrays
    assert(!plan.contains("text#"), s"probe plan carries raw text:\n$plan")
  }
}
