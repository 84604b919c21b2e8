package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.metric.SQLMetric
import org.apache.spark.sql.functions._

/** H18 — observe-backed per-query COST LEDGER (round 16): what a 100 TB
  * deployment needs next to every pipeline — "what did this query
  * actually scan, shuffle, and emit" — WITHOUT any second pass over the
  * data. H15's CollectMetrics piggyback generalized: the result-row
  * counter rides the production plan as an `observe` node, and every
  * other fact is read from the SQL metrics the executed plan's own
  * scan/exchange operators accumulated while serving the action —
  * harvesting is a driver-side walk over already-populated
  * accumulators, ZERO extra jobs, scans, or shuffles.
  *
  * The walk is AQE-aware (AdaptiveSparkPlanExec → executedPlan,
  * QueryStageExec → plan, ReusedExchangeExec → child) and follows
  * subquery plans (scalar/IN subqueries execute real scans that the
  * task-level listener view also sees); metrics are deduplicated by
  * accumulator id, so a node reached through both a reuse edge and its
  * original position counts once — the invariant that makes the ledger
  * ≡ the SparkListener task-metrics view, which is exactly what
  * CostLedgerSpec pins on three plan shapes (scan+agg, snowflake join,
  * window).
  *
  * Reference: the consumer logs per-GetMedia byte/fragment counters as
  * it streams (SergiyStoyan/AwsKinesisConsumer parser.py:295-310, the
  * received-bytes accounting); this is that telemetry re-expressed for
  * a declarative engine, per query instead of per connection. */
object CostLedger {

  /** One query's cost facts, in exact integers.
    *   - scan_rows / scan_bytes / scan_files: rows emitted by, on-disk
    *     bytes listed by, and files read by every file scan in the plan
    *     (bytes are the scan's listed file sizes — what IO was admitted
    *     after partition pruning, the pruning-visible number)
    *   - shuffle_bytes / shuffle_rows: written across every exchange
    *   - result_rows: the observe node's count of rows the query
    *     actually returned to its sink
    *   - wall_ms: the action's wall clock */
  case class QueryCost(query: String, scan_rows: Long, scan_bytes: Long,
      scan_files: Long, shuffle_bytes: Long, shuffle_rows: Long,
      result_rows: Long, wall_ms: Long)

  private def kids(n: SparkPlan): Seq[SparkPlan] = n match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case r: ReusedExchangeExec => Seq(r.child)
    case o => o.children
  }

  private def walk(n: SparkPlan): Seq[SparkPlan] = {
    val subs = n.expressions.flatMap(_.collect {
      case p: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
        p.plan
    }).collect { case sp: SparkPlan => sp }
    n +: (kids(n) ++ subs).flatMap(walk)
  }

  /** Sum metric values deduplicated by accumulator id (reuse edges
    * alias the same node object — same accumulator — into the walk
    * twice); unset driver-side metrics sit at their -1 sentinel and
    * clamp to 0. */
  private def dedupSum(ms: Seq[SQLMetric]): Long =
    ms.distinctBy(_.id).map(m => math.max(0L, m.value)).sum

  /** Harvest the cost facts out of an executed plan — pure driver-side
    * reads of accumulators the action already populated. */
  def harvest(name: String, plan: SparkPlan, resultRows: Long,
      wallMs: Long): QueryCost = {
    val nodes = walk(plan)
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    def of(xs: Seq[SparkPlan], key: String): Long =
      dedupSum(xs.flatMap(_.metrics.get(key)))
    QueryCost(name,
      scan_rows = of(scans, "numOutputRows"),
      scan_bytes = of(scans, "filesSize"),
      scan_files = of(scans, "numFiles"),
      shuffle_bytes = of(shuffles, "shuffleBytesWritten"),
      shuffle_rows = of(shuffles, "shuffleRecordsWritten"),
      result_rows = resultRows, wall_ms = wallMs)
  }

  /** Run ONE production action over `df` (the noop sink — the bench
    * discipline) with the observe counter riding it, then harvest. The
    * query's own action is the only work; the ledger row costs nothing
    * beyond it.
    *
    * The plan whose metrics hold the truth is the WRITE's own
    * QueryExecution (DataFrameWriter re-plans the query under the write
    * command — `df.queryExecution` is a sibling plan the action never
    * executes, and its accumulators stay at zero), so the executed qe
    * is captured with a QueryExecutionListener keyed on this call's
    * unique CollectMetrics name. */
  def measure(name: String, df: DataFrame): QueryCost = {
    val spark = df.sparkSession
    val obsName =
      s"graft_cost_${name}_${java.util.UUID.randomUUID().toString.take(8)}"
    val obs = org.apache.spark.sql.Observation(obsName)
    val observed = df.observe(obs, count(lit(1)).as("result_rows"))
    @volatile var seen
        : Option[(org.apache.spark.sql.execution.QueryExecution, Long)] = None
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val mine = qe.analyzed.collectFirst {
          case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
              if c.name == obsName => c
        }.isDefined
        if (mine && seen.isEmpty) seen = Some((qe, durationNs))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      observed.write.format("noop").mode("overwrite").save()
      val resultRows = obs.get("result_rows") match {
        case l: Long => l
        case o => o.toString.toLong
      }
      // the listener bus is async; the action is done, the event may lag
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      val (qe, durNs) = seen.getOrElse(throw new IllegalStateException(
        s"cost ledger never observed the action for $obsName"))
      harvest(name, qe.executedPlan, resultRows, durNs / 1000000L)
    } finally spark.listenerManager.unregister(ql)
  }

  /** The ledger as a table: one row per (name, query) pair, each run
    * through [[measure]]. The serving surface a pipeline job tacks onto
    * its end to publish what every stage cost. */
  def ledger(spark: SparkSession,
      entries: Seq[(String, DataFrame)]): DataFrame = {
    import spark.implicits._
    entries.map { case (n, df) => measure(n, df) }.toDF()
  }
}
