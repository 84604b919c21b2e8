package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Co-located joins via bucketing (SURVEY §5): writing both sides
  * bucketed + sorted on the join key lets every later join on that key
  * read bucket-aligned files and skip its exchange entirely — the
  * standard answer for a fact⋈fact or stream-archive⋈dimension join
  * that runs every day at 100 TB. */
object Bucketing {
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  /** The catalog-gate tag for [[materializeEnrich]]'s twins. It must
    * change whenever the SOURCE changes, not just the path string: a
    * regenerated sfDir under a live catalog entry would otherwise
    * silently serve stale bucketed twins. Folds a fingerprint of the two
    * source directories (name+len+mtime of every file — two shallow
    * listings, no data read) into a 64-bit hex tag; hex of the raw bits
    * also avoids the abs(hashCode) traps (abs(Int.MinValue) < 0, 32-bit
    * path collisions). */
  private[graft] def sourceTag(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    def fp(sub: String): Long = {
      val p = new Path(sfDir, sub)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).map(s =>
        s.getPath.getName.hashCode * 1000003L ^ s.getLen * 31L ^
          s.getModificationTime).foldLeft(0L)(_ * 6364136223846793005L + _)
    }
    f"${sfDir.hashCode.toLong * 2862933555777941757L ^ fp("events.parquet") ^
      java.lang.Long.rotateLeft(fp("customer.parquet"), 17)}%016x"
  }

  /** Materializes (once per session+sfDir, catalog-gated) the bucketed
    * twins of events and customer that the H10 driver query joins —
    * the test-side stand-in for fact tables a deployment keeps bucketed
    * on their daily join key (at 100 TB the bucket count scales with
    * the data; the co-location property is what's under test, not the
    * fanout). External tables under the JVM tmpdir: the files survive
    * the session, the catalog entry doesn't, so a fresh session deletes
    * and rewrites instead of tripping over the stale location. Returns
    * the (events, customer) table names. */
  def materializeEnrich(t: Tables, sfDir: String,
      buckets: Int = 8): (String, String) = {
    val spark = t.events.sparkSession
    val tag = sourceTag(spark, sfDir)
    def ensure(base: String, df: => DataFrame, key: String): String = {
      val tbl = s"${base}_$tag"
      if (!spark.catalog.tableExists(tbl)) {
        val path = new Path(System.getProperty("java.io.tmpdir"),
          s"graft_bucketed_$tbl")
        val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(path, true) // files left by an earlier session
        df.write.bucketBy(buckets, key).sortBy(key)
          .option("path", path.toString).saveAsTable(tbl)
      }
      tbl
    }
    (ensure("b_enrich_events", t.events.select("user_id", "value"),
        "user_id"),
      ensure("b_enrich_customer",
        t.customer.select("c_custkey", "c_mktsegment"), "c_custkey"))
  }
}
