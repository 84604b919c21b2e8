package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("custom AsOfJoinPlan matches the window-form as-of semantics") {
    val e = t.events.selectExpr("event_id", "user_id", "ts div 1000000 as ts_ms", "event_type")
    val data = e.filter(col("event_type") =!= "error")
      .select("event_id", "user_id", "ts_ms")
    val markers = e.filter(col("event_type") === "error")
      .select(col("user_id").as("m_user"), col("ts_ms").as("m_ts"),
        col("event_id").as("m_id"))

    val got = AsOf.join(data, markers,
        "user_id", "ts_ms", "m_user", "m_ts", "m_id")
      .select("event_id", "asof_match").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap

    val expected = graft.operators.EventOps.asofNextMarker(t).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap

    assert(got.size == expected.size)
    val diffs = expected.filter { case (k, v) => got.get(k).orNull != v }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }

  test("the custom node plans through AsOfJoinStrategy without a join operator") {
    val e = t.events.selectExpr("event_id", "user_id", "ts div 1000000 as ts_ms")
    val m = e.limit(10).select(col("user_id").as("mu"), col("ts_ms").as("mt"),
      col("event_id").as("mid"))
    val df = AsOf.join(e, m, "user_id", "ts_ms", "mu", "mt", "mid")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of lowered to a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
