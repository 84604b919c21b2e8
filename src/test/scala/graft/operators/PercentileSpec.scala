package graft.operators

import graft.SparkSpec

/** The approx-percentile scale path must stay close to the exact
  * rank-selection oracle and must not inherit its low-cardinality
  * window bottleneck. */
class PercentileSpec extends SparkSpec {

  test("approx percentiles land within 2% rank error of the true quantile") {
    import org.apache.spark.sql.functions._
    // ground truth: the full sorted value list per type (tiny at sf0.001)
    val values = t.events
      .select(col("event_type"), graft.functions.cents(col("value")).as("v_c"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    val approx = Analytics.approxPercentiles(t).collect()
      .flatMap(r => Seq(
        (r.getString(0), 0.5) -> r.getLong(1),
        (r.getString(0), 0.9) -> r.getLong(2))).toMap
    assert(approx.keySet.map(_._1) == values.keySet)
    approx.foreach { case ((typ, q), a) =>
      val vs = values(typ)
      // empirical CDF straddles the answer: rank error <= 2%
      val below = vs.count(_ < a).toDouble / vs.length
      val atOrBelow = vs.count(_ <= a).toDouble / vs.length
      assert(below <= q + 0.02 && atOrBelow >= q - 0.02,
        s"($typ,$q): approx $a has CDF [$below, $atOrBelow]")
    }
  }

  test("approx percentile plan has no window operator") {
    val plan = Analytics.approxPercentiles(t).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale path re-grew a window sort:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"), plan)
  }
}
