package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import KinesisSource._

/** The option mapping IS the integration (the connector itself is not
  * reachable in this sandbox) — pin each StartSelector's translation to
  * the reference semantics it encodes (parser.py:292-303). */
class KinesisSourceSpec extends AnyFunSuite {

  private val base = KinesisOptions("video-stream", "us-west-2")

  test("NOW maps to LATEST with a fresh checkpoint") {
    val o = base.copy(start = Now)
    assert(sourceOptions(o) == Map(
      "streamName" -> "video-stream",
      "region" -> "us-west-2",
      "startingPosition" -> "LATEST"))
    assert(checkpointLocation(o, "/tmp/fresh") == "/tmp/fresh")
  }

  test("CONTINUATION_TOKEN maps to reusing the previous checkpoint") {
    val o = base.copy(start = ContinuationToken("/chk/run1"))
    // the position option is irrelevant on restart — the commit log wins
    assert(sourceOptions(o)("startingPosition") == "LATEST")
    assert(checkpointLocation(o, "/tmp/fresh") == "/chk/run1")
  }

  test("backfill selectors map to horizon / timestamp positions") {
    assert(sourceOptions(base.copy(start = TrimHorizon))("startingPosition")
      == "TRIM_HORIZON")
    val at = sourceOptions(base.copy(start = AtTimestamp(1700000000000L)))
    assert(at("startingPosition") == "AT_TIMESTAMP")
    assert(at("startingTimestamp") == "1700000000000")
  }

  test("explicit GetDataEndpoint result flows through as endpointUrl") {
    val o = base.copy(endpointUrl = Some("https://e.example"))
    assert(sourceOptions(o)("endpointUrl") == "https://e.example")
  }
}
