package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thin adapter from the reference's GetMedia session setup
  * (parser.py:272-310) to a Structured Streaming `format("kinesis")`
  * reader. The sandbox has no network and no Kinesis connector jar, so
  * this object stays deliberately thin: it encodes the OPTION MAPPING —
  * the part of the integration that carries the reference's semantics —
  * and degrades to [[FragmentSource]]'s directory stream locally, which
  * yields the same (blob, path) schema downstream operators consume.
  *
  * Reference ↔ reader mapping:
  *  - `get_data_endpoint(StreamName, APIName='GET_MEDIA')` →
  *    `DataEndpoint` (parser.py:278-283): becomes the `endpointUrl`
  *    option; connectors that call GetDataEndpoint themselves may omit
  *    it and derive the endpoint from `region` + `streamName`.
  *  - `get_media(StreamName, StartSelector)` (parser.py:305-308):
  *    `streamName` option plus the starting position below.
  *  - `StartSelectorType: NOW` (parser.py:300-303) → startingPosition
  *    LATEST with a FRESH checkpoint location.
  *  - `StartSelectorType: CONTINUATION_TOKEN` + token from the last
  *    packet's AWS_KINESISVIDEO_CONTINUATION_TOKEN tag
  *    (parser.py:294-297) → restart with the SAME checkpoint location:
  *    Structured Streaming's commit log is the durable continuation
  *    token, so the query resumes exactly after the last committed
  *    record — the reference keeps the token in memory and loses exact
  *    resume on process death; the checkpoint form survives it.
  *  - The reference has no horizon/timestamp replay (a live consumer);
  *    TRIM_HORIZON / AT_TIMESTAMP are included because a training-data
  *    backfill starts from retention, not NOW.
  *
  * Option KEYS follow the open-source Structured Streaming Kinesis
  * connector family (`format("kinesis")` with streamName/endpointUrl/
  * startingPosition); deployments whose connector spells a key
  * differently (e.g. `awsRegion` vs `region`) adapt in one place here.
  */
object KinesisSource {

  /** parser.py:292-303 — the two reference selectors plus the two
    * backfill selectors a batch-oriented pipeline needs. */
  sealed trait StartSelector
  /** 'StartSelectorType': 'NOW' — read only records arriving from now. */
  case object Now extends StartSelector
  /** Replay from the stream's retention horizon (backfill). */
  case object TrimHorizon extends StartSelector
  /** Replay from a producer timestamp (epoch millis). */
  final case class AtTimestamp(epochMs: Long) extends StartSelector
  /** 'StartSelectorType': 'CONTINUATION_TOKEN' — resume exactly after
    * the last committed position. The checkpoint directory IS the
    * token; pass the SAME location used by the previous run. */
  final case class ContinuationToken(checkpointLocation: String)
      extends StartSelector

  final case class KinesisOptions(
      streamName: String,
      region: String,
      endpointUrl: Option[String] = None,
      start: StartSelector = Now)

  /** The reader options the selector mapping produces — unit-tested so
    * the semantics survive connector swaps. */
  def sourceOptions(o: KinesisOptions): Map[String, String] = {
    val base = Map("streamName" -> o.streamName, "region" -> o.region) ++
      o.endpointUrl.map("endpointUrl" -> _)
    o.start match {
      case Now => base + ("startingPosition" -> "LATEST")
      case TrimHorizon => base + ("startingPosition" -> "TRIM_HORIZON")
      case AtTimestamp(ms) => base +
        ("startingPosition" -> "AT_TIMESTAMP") +
        ("startingTimestamp" -> ms.toString)
      // the position option is a no-op on restart: the checkpoint's
      // commit log wins, which is exactly the continuation semantics
      case ContinuationToken(_) => base + ("startingPosition" -> "LATEST")
    }
  }

  /** Where the stream must be checkpointed for the selector to mean
    * what the reference means: CONTINUATION_TOKEN reuses the previous
    * location, everything else needs a fresh one. */
  def checkpointLocation(o: KinesisOptions, freshDir: => String): String =
    o.start match {
      case ContinuationToken(loc) => loc
      case _ => freshDir
    }

  /** The network reader. Unresolvable in this sandbox (no connector jar,
    * no egress) — calling `load()` requires a deployment with a
    * `kinesis` DataSource on the classpath. Records map to the
    * (blob, path) contract of [[FragmentSource.fragmentStream]]:
    * payload bytes as `blob`, stream/partition/sequence as `path`. */
  def kinesisStream(spark: SparkSession, o: KinesisOptions): DataFrame =
    spark.readStream
      .format("kinesis")
      .options(sourceOptions(o))
      .load()
      .select(col("data").as("blob"),
        concat_ws("/", col("streamName"), col("partitionKey"),
          col("sequenceNumber")).as("path"))

  /** Environment-dispatching entry: a directory (object-store prefix or
    * local path) runs the sandbox-faithful file analog; None runs the
    * real connector. Both return the same schema, so the EBML pipeline
    * downstream is identical. */
  def stream(spark: SparkSession, o: KinesisOptions,
      localDir: Option[String]): DataFrame =
    localDir match {
      case Some(dir) => FragmentSource.fragmentStream(spark, dir)
      case None => kinesisStream(spark, o)
    }
}
