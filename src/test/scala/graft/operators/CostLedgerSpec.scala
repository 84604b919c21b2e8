package graft.operators

import graft.SparkSpec
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

class CostLedgerSpec extends SparkSpec {

  /** Aggregate the INDEPENDENT ground truth — SparkListener task-level
    * metrics — across everything `body` runs. */
  private def withTaskMetrics[A](body: => A): (A, Long, Long, Long, Long) = {
    val recs = new AtomicLong
    val shufB = new AtomicLong
    val shufR = new AtomicLong
    val jobs = new AtomicLong
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          recs.addAndGet(m.inputMetrics.recordsRead)
          shufB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      Thread.sleep(600) // drain the async listener bus
      (a, recs.get, shufB.get, shufR.get, jobs.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def shapes: Seq[(String, DataFrame)] = Seq(
    "q1_pricing_summary" -> Analytics.q1PricingSummary(t), // scan + agg
    "q5_region_revenue" -> Analytics.q5RegionRevenue(t), // snowflake join
    "window_running_sum" -> Analytics.windowRunningSum(t)) // window

  test("ledger equals SparkListener task metrics on three plan shapes (H18)") {
    for ((name, df) <- shapes) {
      val (cost, recs, shufB, shufR, _) =
        withTaskMetrics(CostLedger.measure(name, df))
      assert(cost.query == name)
      // the plan-harvested scan rows ARE the task-level records read
      assert(cost.scan_rows == recs,
        s"$name: ledger scan_rows ${cost.scan_rows} != listener recordsRead $recs")
      // every exchange's write metrics, byte- and row-exact
      assert(cost.shuffle_bytes == shufB,
        s"$name: ledger shuffle_bytes ${cost.shuffle_bytes} != listener $shufB")
      assert(cost.shuffle_rows == shufR,
        s"$name: ledger shuffle_rows ${cost.shuffle_rows} != listener $shufR")
      // the observe counter counts what the sink received
      assert(cost.result_rows == df.count(),
        s"$name: result_rows ${cost.result_rows}")
      assert(cost.scan_files > 0 && cost.wall_ms >= 0)
      info(s"$name: scan ${cost.scan_rows} rows / ${cost.scan_bytes} B / " +
        s"${cost.scan_files} files, shuffle ${cost.shuffle_bytes} B, " +
        s"result ${cost.result_rows} rows")
    }
  }

  test("a plan with a REAL scalar subquery still reconciles: the walk follows subquery plans (H18)") {
    // an uncorrelated scalar subquery plans a separate SubqueryExec
    // whose scan the task-level listener sees — the ledger must walk
    // into it or scan_rows undercounts
    t.orders.createOrReplaceTempView("cl_orders")
    val df = spark.sql(
      """SELECT o_orderkey FROM cl_orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM cl_orders)""")
    val (cost, recs, shufB, shufR, _) =
      withTaskMetrics(CostLedger.measure("scalar_subquery", df))
    assert(cost.scan_rows == recs,
      s"subquery scan rows missed: ledger ${cost.scan_rows} vs listener $recs")
    assert(cost.shuffle_bytes == shufB && cost.shuffle_rows == shufR)
    assert(cost.result_rows == df.count())
    // both the outer scan and the subquery scan read orders: the rows
    // must be counted twice (2 x 1500 at sf0.001)
    assert(cost.scan_rows == 2 * t.orders.count(),
      s"expected both scans counted, got ${cost.scan_rows}")
  }

  test("scan_bytes is the listed on-disk input: q1 reads exactly the lineitem file (H18)") {
    val cost = CostLedger.measure("q1", Analytics.q1PricingSummary(t))
    val onDisk = new java.io.File(s"$sfDir/lineitem.parquet").length
    assert(cost.scan_bytes == onDisk,
      s"scan_bytes ${cost.scan_bytes} != lineitem.parquet on disk $onDisk")
    assert(cost.scan_files == 1L)
  }

  test("the observe counter adds ZERO jobs: measure spends the same job count as the bare action (H18)") {
    val df = Analytics.q1PricingSummary(t)
    val (_, _, _, _, bareJobs) = withTaskMetrics {
      df.write.format("noop").mode("overwrite").save()
    }
    val (_, _, _, _, measuredJobs) = withTaskMetrics {
      CostLedger.measure("q1", df)
    }
    assert(measuredJobs == bareJobs,
      s"measure ran $measuredJobs jobs vs the bare action's $bareJobs")
  }

  test("ledger surfaces as a table, one row per query (H18)") {
    val led = CostLedger.ledger(spark, shapes.take(2))
    val rows = led.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("q1_pricing_summary", "q5_region_revenue"))
    assert(rows.forall(_.getLong(1) > 0L)) // scan_rows
    assert(led.columns.toSeq == Seq("query", "scan_rows", "scan_bytes",
      "scan_files", "shuffle_bytes", "shuffle_rows", "result_rows",
      "wall_ms"))
  }
}
