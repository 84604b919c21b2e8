package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for declared queries to files, one per
  * query — the committed plan evidence for optimization rounds
  * (`plans/r<N>/<query>_{before,after}.txt`). The session is configured
  * exactly like [[graft.Bench]] so the dumped plan is the plan the bench
  * times (same shuffle-partition, AQE, and split settings).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * With no query list, dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // capture the plans of eagerly-checkpointed SUB-STAGES too: the
    // fixpoint families' final plans read ExistingRDDs, so the stage
    // plans (band cascade, per-round iteration, index probe) are the
    // only artifact that can show an algorithm change there (round-20
    // verdict item 5)
    spark.conf.set("spark.graft.plandump.captureStages", "true")
    Files.createDirectories(outDir)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var failures = 0
    names.foreach { name =>
      StagePlans.drain() // discard stages recorded by a previous failure
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        // building df ran the eager sub-stages; their recorded plans
        // belong to this query
        val stages = StagePlans.drain()
        if (stages.nonEmpty) {
          val body = stages.map { case (tag, plan) =>
            s"== Stage: $tag ==\n$plan" }.mkString("\n")
          Files.writeString(
            outDir.resolve(s"${name}_stages_$suffix.txt"), body)
        }
        println(s"[plandump] $name ok (${txt.length} chars, " +
          s"${stages.length} stages)")
      } catch { case e: Throwable =>
        failures += 1
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    // a scripted dump must not silently commit an incomplete evidence
    // set (round-20 advice)
    if (failures > 0) {
      System.err.println(s"[plandump] $failures queries failed to dump")
      System.exit(1)
    }
  }
}
