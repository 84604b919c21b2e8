package graft.sources

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
}
