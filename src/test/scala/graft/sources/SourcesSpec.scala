package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C14/C15 — source/sink round-trips with explicit schemas and partitioned
  * writes (the frame-persistence analog, parser.py:483-486). */
class SourcesSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-sources").toString

  test("csv round-trip with explicit schema") {
    val dir = tmp() + "/csv"
    val src = t.orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.write.option("header", "true").csv(dir)
    val back = spark.read
      .schema("o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double")
      .option("header", "true").csv(dir)
    assert(back.count() == src.count())
    assert(back.agg(sum("o_orderkey")).head().getLong(0) ==
      src.agg(sum("o_orderkey")).head().getLong(0))
  }

  test("json round-trip preserves values") {
    val dir = tmp() + "/json"
    val src = t.customer
    src.write.json(dir)
    val back = spark.read
      .schema("c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string")
      .json(dir)
    assert(back.count() == src.count())
  }

  test("catalog queries run identically from csv and json table sources") {
    import graft.operators._
    val dir = tmp()
    for (fmt <- Seq("csv", "json")) {
      TableFormats.exportTables(t, s"$dir/$fmt", fmt)
      val t2 = TableFormats.loadTables(spark, s"$dir/$fmt", fmt)
      // timestamps (lineitem), long-nanos events, and float arrays all
      // survive the text round-trip byte-for-byte
      assert(Analytics.q1PricingSummary(t2).collect().toSeq ==
        Analytics.q1PricingSummary(t).collect().toSeq, s"$fmt q1")
      assert(EventOps.rateTumbling(t2).collect().toSeq ==
        EventOps.rateTumbling(t).collect().toSeq, s"$fmt rate_tumbling")
      assert(Similarity.annBruteTopK(t2).collect().toSeq ==
        Similarity.annBruteTopK(t).collect().toSeq, s"$fmt ann_brute")
      assert(TextOps.fingerprint(t2).collect().toSeq ==
        TextOps.fingerprint(t).collect().toSeq, s"$fmt fingerprint")
    }
  }

  test("retention evicts the oldest partitions like the frame queue (parser.py:475-481)") {
    val dir = tmp() + "/frames"
    // three appends of time-bucketed "frames"; keep the newest 2 buckets
    for (b <- 1 to 3) {
      val batch = t.events.limit(10)
        .withColumn("bucket", lit(f"$b%05d"))
      val evicted = Retention.writeWithRetention(batch, dir, "bucket", keepNewest = 2)
      if (b <= 2) assert(evicted.isEmpty)
      else assert(evicted == Seq("00001"), s"append $b evicted $evicted")
    }
    val left = spark.read.parquet(dir)
      .select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(left == Seq(2L, 3L))
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp() + "/part"
    t.events.withColumn("etype", col("event_type"))
      .write.partitionBy("etype").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("etype") === "click")
    assert(one.count() == t.events.filter(col("event_type") === "click").count())
    // partition pruning must reach the scan
    val plan = one.queryExecution.executedPlan.toString
    assert(Files.list(java.nio.file.Paths.get(dir)).toArray.map(_.toString)
      .exists(_.contains("etype=click")))
  }
}
