package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SURVEY §5: co-located joins via bucketing. Writing both fact tables
  * bucketed on the join key lets the join read bucket-aligned files and
  * skip the shuffle entirely — at 100 TB this turns the biggest exchange
  * in the plan into a free merge. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog resets between runs but the warehouse files
    // persist — clear them so CREATE TABLE AS doesn't hit LOCATION_EXISTS
    Seq("b_orders", "b_lineitem").foreach { tbl =>
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$tbl")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    t.lineitem.select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val n = joined.count()
    assert(n == t.lineitem.count()) // every lineitem has its order

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }
}
