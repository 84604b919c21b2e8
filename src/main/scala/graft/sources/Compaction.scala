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
  *   3. a `_compact_pending` REDO marker (listing the small files) is
  *      written, staged files move into the partition, the old small
  *      files are deleted, and the marker is removed. A crash anywhere
  *      in that window leaves duplicates or stragglers VISIBLE — but
  *      the next run replays the redo log first (finish the moves,
  *      delete the listed smalls) before doing anything new, so re-runs
  *      converge to the exact compacted state instead of baking the
  *      crash-window duplicates in permanently (the failure mode of
  *      marker-less move-then-delete). The marker is written only after
  *      staging fully materializes, so replay never loses rows.
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
      recoverCrash(fs, p.getPath)
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
        fs.delete(tmp, true) // no marker => staging is restartable scratch
        spark.read.option("basePath", path)
          .parquet(small.map(_.getPath.toString): _*)
          .drop(p.getPath.getName.split("=")(0)) // dir name re-adds it
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val staged = fs.listStatus(tmp).filter(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet"))
        // redo log: from here on, a re-run COMPLETES this compaction
        // instead of restarting it
        writePending(fs, p.getPath, small.map(_.getPath.getName))
        staged.foreach { s =>
          fs.rename(s.getPath,
            new Path(p.getPath, "compacted-" + s.getPath.getName))
        }
        small.foreach(s => fs.delete(s.getPath, false))
        fs.delete(tmp, true)
        fs.delete(new Path(p.getPath, PendingName), false)
        rewritten += bytes
        after += files.length - small.length + staged.length
      }
    }
    CompactionStats(nParts, before, after, rewritten)
  }

  private val PendingName = "_compact_pending"

  /** The marker must be all-or-nothing: recoverCrash deletes exactly the
    * listed smalls, so a half-written (truncated) marker would finish the
    * moves but leave unlisted smalls in place — permanent duplicates. We
    * get atomicity from the filesystem: write to a `.tmp` name, then
    * rename into place (atomic on HDFS and POSIX); a crash mid-write
    * leaves only the ignored `.tmp`, never a valid-looking partial log. */
  private def writePending(fs: FileSystem, part: Path,
      smallNames: Seq[String]): Unit = {
    val tmpMarker = new Path(part, PendingName + ".tmp")
    val outS = fs.create(tmpMarker, true)
    outS.write(smallNames.mkString("\n").getBytes("UTF-8"))
    outS.close()
    if (!fs.rename(tmpMarker, new Path(part, PendingName)))
      throw new java.io.IOException(
        s"could not publish compaction redo marker under $part")
  }

  /** Replay a crashed compaction's redo log: the marker exists only
    * once staging fully materialized, so finishing = move any staged
    * files still in `_compact_tmp` into the partition, delete the
    * listed small files that survive, then drop marker + staging. */
  private def recoverCrash(fs: FileSystem, part: Path): Unit = {
    // a leftover .tmp is a crash BEFORE publication: staging was intact
    // but no move/delete had started — plain scratch, safe to discard
    fs.delete(new Path(part, PendingName + ".tmp"), false)
    val marker = new Path(part, PendingName)
    if (!fs.exists(marker)) return
    val tmp = new Path(part, "_compact_tmp")
    if (fs.exists(tmp)) {
      fs.listStatus(tmp).filter(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet")).foreach { s =>
        fs.rename(s.getPath, new Path(part, "compacted-" + s.getPath.getName))
      }
    }
    val in = fs.open(marker)
    val names = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    in.close()
    names.foreach { n =>
      val f = new Path(part, n)
      if (fs.exists(f)) fs.delete(f, false)
      ()
    }
    fs.delete(tmp, true)
    fs.delete(marker, false)
    ()
  }
}
