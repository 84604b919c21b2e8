package graft.operators

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  test("hll approximate distinct stays within its error bound") {
    val rows = Analytics.approxDistinct(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t.events.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count_distinct(
        org.apache.spark.sql.functions.col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = rows(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.1, s"$k: approx=$ap exact=$ex")
    }
  }

  test("yearly aggregation partitions all orders") {
    val rows = Analytics.yearlyOrders(t).collect()
    assert(rows.map(_.getLong(1)).sum == t.orders.count())
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }
}
