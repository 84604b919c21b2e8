package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.cents

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val direct = t.events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(t.events, "event_type", cents(col("value")),
        col("event_id"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val dim = t.events.select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast("long"))
    val plain = t.events.join(dim, "event_type")
      .agg(sum("weight")).head().getLong(0)
    val salted = Skew.saltedJoin(t.events, dim, "event_type", col("event_id"), salts = 8)
      .agg(sum("weight")).head().getLong(0)
    assert(salted == plain)
  }
}
