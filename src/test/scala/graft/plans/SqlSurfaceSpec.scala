package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.TextOps

/** The pure-SQL surface: a user who speaks only `spark.sql` gets the
  * same engine — temp views over the tables, graft native functions
  * callable from SQL (the in-session twin of the GraftExtensions
  * `spark.sql.extensions` registration), identical results to the
  * DataFrame operators. */
class SqlSurfaceSpec extends SparkSpec {

  test("native kernels are callable from SQL and match the operators") {
    VectorFunctions.register(spark)
    t.documents.createOrReplaceTempView("documents_v")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_fingerprint(text) AS fp FROM documents_v ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaOps = TextOps.fingerprint(t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaOps)
  }

  test("an analytics query expressed in SQL matches its DataFrame twin") {
    t.orders.createOrReplaceTempView("orders_v")
    val viaSql = spark.sql(
      """SELECT o_custkey, count(*) AS n,
           cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) AS sum_c
         FROM orders_v GROUP BY o_custkey ORDER BY o_custkey""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaDf = t.orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.cents(col("o_totalprice"))).as("sum_c"))
      .orderBy("o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.sameElements(viaDf))
  }
}
