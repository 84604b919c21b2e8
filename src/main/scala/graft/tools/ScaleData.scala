package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-probe data generator (round-6 verdict #8): synthesizes an
  * sf1-shaped `documents` + `embeddings` corpus from the driver's sf0.1
  * tables so the LSH/cluster family can be wall-clocked at 10× the
  * bench SF — the cheapest empirical check that the "no O(n²)
  * anywhere" claims hold off the toy scale.
  *
  * This data feeds PERFORMANCE probes only, never correctness gates —
  * the oracle queries keep reading the driver-owned testdata untouched.
  *
  * Replication must not inflate the near-dup structure: copying text or
  * vectors verbatim would make every row a cross-replica exact/near
  * duplicate, turning each original document into a clique of `factor`
  * copies — candidate-pair output would grow quadratically in the
  * replica count, which no real 10× corpus does. Instead each replica
  * is decorrelated deterministically:
  *   - documents: replica i Caesar-shifts letters by i (`translate`),
  *     preserving whitespace/length/token structure (so per-doc work is
  *     unchanged) while rewriting every shingle hash — replicas are
  *     unrelated documents to every dedup tier, and the WITHIN-replica
  *     duplicate structure is preserved exactly.
  *   - embeddings: replica i rotates the 64-dim vector by 6i positions
  *     — norm-preserving, and a rotation of an unstructured vector is
  *     uncorrelated with the original, so no cross-replica near-dup
  *     pairs appear.
  *   - events: replica i shifts event_id by the id stride and ts by
  *     i·(span + 1 h) — per-user history grows ×factor (the long-
  *     retention shape), so windows, sessionization, and the range
  *     join see genuinely longer per-key timelines, not duplicated
  *     instants.
  *   - orders/lineitem: replica i shifts the shared o_orderkey /
  *     l_orderkey join key; customer/part/supplier keys stay — facts
  *     grow ×factor over fixed dims, the realistic warehouse shape
  *     (fan-outs stay linear).
  * Ids offset by i·10^9 keep replicas disjoint. The remaining dims copy
  * through unchanged.
  */
object ScaleData {
  val IdStride = 1000000000L

  private def caesar(i: Int): (String, String) = {
    val lower = ('a' to 'z').mkString
    val upper = ('A' to 'Z').mkString
    def rot(s: String) = s.drop(i % 26) + s.take(i % 26)
    (lower + upper, rot(lower) + rot(upper))
  }

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    // the alphabet has 26 rotations: replica 26 would Caesar-shift by 0
    // again and recreate every document verbatim — a silent quadratic
    // near-dup clique per original, exactly what the decorrelation
    // exists to prevent
    require(factor <= 26,
      s"scaleDocuments factor $factor > 26: Caesar decorrelation wraps " +
        "at 26 replicas and would recreate exact duplicates")
    (0 until factor).map { i =>
      val (from, to) = caesar(i)
      docs.select(
        (col("doc_id") + lit(i * IdStride)).as("doc_id"),
        (if (i == 0) col("text") else translate(col("text"), from, to))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  def scaleEmbeddings(embs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { i =>
      val r = (i * 6) % 64
      embs.select(
        (col("vec_id") + lit(i * IdStride)).as("vec_id"),
        (if (r == 0) col("embedding")
         else concat(slice(col("embedding"), r + 1, 64 - r),
           slice(col("embedding"), 1, r))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

  /** Replica i: event_id shifted by the id stride, ts shifted by
    * i·spanNs — same users, ×factor longer per-user history. `events`
    * must already carry the epoch-long-ns ts contract
    * ([[graft.sources.Tables.normalizeEventsTs]]). */
  def scaleEvents(events: DataFrame, factor: Int, spanNs: Long): DataFrame =
    (0 until factor).map { i =>
      events.select(
        (col("event_id") + lit(i * IdStride)).as("event_id"),
        (col("ts") + lit(i * spanNs)).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)

  /** Replica i shifts the shared order join key on both fact tables;
    * dim keys (custkey/partkey/suppkey) stay, so fan-outs are linear. */
  def scaleByOrderKey(df: DataFrame, keyCol: String, factor: Int): DataFrame =
    (0 until factor).map { i =>
      df.withColumn(keyCol, col(keyCol) + lit(i * IdStride))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor)
      .repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    val ev = graft.sources.Tables.normalizeEventsTs(
      spark.read.parquet(s"$src/events.parquet"))
    val tsRange = ev.agg(min("ts"), max("ts")).head()
    require(!tsRange.isNullAt(0),
      s"$src/events.parquet is empty — cannot derive the replica time span")
    val spanNs = tsRange.getLong(1) - tsRange.getLong(0) + 3600L * 1000000000L
    scaleEvents(ev, factor, spanNs)
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    scaleByOrderKey(spark.read.parquet(s"$src/orders.parquet"),
        "o_orderkey", factor)
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    scaleByOrderKey(spark.read.parquet(s"$src/lineitem.parquet"),
        "l_orderkey", factor)
      .repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"scaled $src -> $out x$factor")
    spark.stop()
  }
}
