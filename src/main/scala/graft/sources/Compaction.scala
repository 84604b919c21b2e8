package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file COMPACTION for partitioned parquet (SURVEY §2 H14 —
  * Delta/Iceberg `OPTIMIZE`, the maintenance sibling of the H13 merge):
  * every incremental merge/append leaves another small file per touched
  * partition; after thousands of batches a 100 TB table's scan cost is
  * dominated by file-open overhead and footer reads, not bytes. This
  * helper bin-packs each partition's SMALL files into ~targetBytes
  * outputs while leaving already-large files untouched — rewrite cost
  * is proportional to the fragmented tail, never the table.
  *
  * Mechanics per partition directory:
  *   1. list data files; those >= `smallBytes` are kept as-is (never
  *      read, never rewritten);
  *   2. the small ones are read back (with `basePath` so the partition
  *      column survives) and written as ceil(Σbytes / targetBytes)
  *      files into a `_compact_tmp` staging dir;
  *   3. staged files move into the partition, then the old small files
  *      are deleted — a crash between 3a and 3b leaves DUPLICATE rows
  *      visible (the same window the FrameIndex compactor documents);
  *      idempotent re-run converges because staging is cleared first.
  *
  * Driver state: file metadata only (names + sizes), never rows. The
  * rewrite is one narrow coalesce job per compaction — no shuffle, no
  * sort: this helper restores FILE granularity; re-clustering content
  * is [[Layout]]'s (H12) job and composes downstream of it. */
object Compaction {

  final case class CompactionStats(
      partitionsCompacted: Int, filesBefore: Int, filesAfter: Int,
      bytesRewritten: Long)

  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      smallBytes: Long = 32L * 1024 * 1024): CompactionStats = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    var nParts = 0
    var before = 0
    var after = 0
    var rewritten = 0L
    parts.foreach { p =>
      val files = fs.listStatus(p.getPath).filter(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      val small = files.filter(_.getLen < smallBytes)
      before += files.length
      if (small.length < 2) {
        after += files.length // nothing to pack (0 or 1 small file)
      } else {
        nParts += 1
        val bytes = small.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        val tmp = new Path(p.getPath, "_compact_tmp")
        fs.delete(tmp, true) // idempotent re-run: clear stale staging
        spark.read.option("basePath", path)
          .parquet(small.map(_.getPath.toString): _*)
          .drop(p.getPath.getName.split("=")(0)) // dir name re-adds it
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val staged = fs.listStatus(tmp).filter(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet"))
        staged.foreach { s =>
          fs.rename(s.getPath,
            new Path(p.getPath, "compacted-" + s.getPath.getName))
        }
        small.foreach(s => fs.delete(s.getPath, false))
        fs.delete(tmp, true)
        rewritten += bytes
        after += files.length - small.length + staged.length
      }
    }
    CompactionStats(nParts, before, after, rewritten)
  }
}
