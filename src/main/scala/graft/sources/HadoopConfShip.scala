package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Ships a session's Hadoop configuration into task closures: a
  * `Configuration` is not Java-serializable, so the entries travel as a
  * plain array and rebuild lazily per task. Shared by the ebml
  * DataSourceV2 reader and the FragmentArchive writer — one place to
  * later filter oversized or sensitive entries for both. */
object HadoopConfShip {

  /** Capture the entries of `spark`'s Hadoop conf. Call on the DRIVER,
    * at plan-build time, with the owning session in hand — resolving
    * via SparkSession.active inside the scan instead can pick up a
    * different thread's session in multi-session applications. */
  def capture(spark: SparkSession): Array[(String, String)] =
    spark.sessionState.newHadoopConf().iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray

  /** Rebuild a Configuration from captured entries (task side). */
  def rebuild(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}
