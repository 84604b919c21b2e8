package graft.ebml

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Column-level EBML kernels (SURVEY §2A/§2G).
  *
  * `encodeFragment` builds a Kinesis-video-style MKV fragment per row:
  * EBML header, then a Segment carrying the AWS tag set the reference
  * extracts (parser.py:30-37) plus graft payload tags, then a Cluster with
  * one SimpleBlock holding the binary payload. `parseTags`/`parseElements`/
  * `firstBlock` are the reader side. Deterministic ⇒ the round-trip query
  * is oracle-checkable from the source rows alone.
  */
object EbmlFunctions {

  val FragmentNumber = "AWS_KINESISVIDEO_FRAGMENT_NUMBER"
  val ServerTs = "AWS_KINESISVIDEO_SERVER_TIMESTAMP"
  val ProducerTs = "AWS_KINESISVIDEO_PRODUCER_TIMESTAMP"
  val MillisBehind = "AWS_KINESISVIDEO_MILLIS_BEHIND_NOW"
  val ContinuationToken = "AWS_KINESISVIDEO_CONTINUATION_TOKEN"
  val UserIdTag = "GRAFT_USER_ID"
  val ValueCentsTag = "GRAFT_VALUE_CENTS"

  def buildFragment(eventId: Long, tsMs: Long, userId: Long, valueC: Long,
      props: String): Array[Byte] = {
    import Ebml._
    val header = element(0x1a45dfa3L, concat(
      element(0x4282L, utf8("matroska")),
      element(0x4285L, uintBytes(2L, 1))))
    val tags = element(0x1254c367L, element(0x7373L, concat(
      element(0x63c0L, Array.emptyByteArray),
      simpleTag(FragmentNumber, eventId.toString),
      simpleTag(ServerTs, tsMs.toString),
      simpleTag(ProducerTs, tsMs.toString),
      simpleTag(MillisBehind, "0"),
      simpleTag(ContinuationToken, s"tok-$eventId"),
      simpleTag(UserIdTag, userId.toString),
      simpleTag(ValueCentsTag, valueC.toString))))
    val cluster = element(0x1f43b675L, concat(
      element(0xe7L, uintBytes(tsMs, 8)),
      simpleBlock(utf8(props))))
    concat(header, element(0x18538067L, concat(tags, cluster)))
  }

  /** Encode one events row into an MKV fragment blob. */
  val encodeFragment: UserDefinedFunction =
    udf { (eventId: Long, tsMs: Long, userId: Long, valueC: Long, props: String) =>
      buildFragment(eventId, tsMs, userId, valueC, if (props == null) "" else props)
    }

  val ErrorCode = "AWS_KINESISVIDEO_ERROR_CODE"
  val ErrorId = "AWS_KINESISVIDEO_ERROR_ID"

  final case class FragmentTags(
      fragment_number: String, server_ts: String, producer_ts: String,
      millis_behind: String, continuation_token: String,
      user_id: String, value_cents: String,
      error_code: String, error_id: String)

  /** Extract the AWS tag set from a fragment, including the error tags the
    * reference surfaces on stream faults (parser.py:352-366, 357-360). */
  val parseTags: UserDefinedFunction =
    udf { (blob: Array[Byte]) =>
      val m = Ebml.tags(blob)
      FragmentTags(
        m.getOrElse(FragmentNumber, null), m.getOrElse(ServerTs, null),
        m.getOrElse(ProducerTs, null), m.getOrElse(MillisBehind, null),
        m.getOrElse(ContinuationToken, null), m.getOrElse(UserIdTag, null),
        m.getOrElse(ValueCentsTag, null),
        m.getOrElse(ErrorCode, null), m.getOrElse(ErrorId, null))
    }

  final case class FragmentSlice(position: Long, fragment: Array[Byte])

  /** Continuous-stream splitting (parser.py:362-375 boundary semantics):
    * one blob of concatenated fragments → per-fragment slices with the
    * absolute stream position of each fragment head. */
  val splitFragments: UserDefinedFunction =
    udf { (blob: Array[Byte]) =>
      if (blob == null) Array.empty[FragmentSlice]
      else Ebml.splitFragments(blob)
        .map { case (p, b) => FragmentSlice(p, b) }.toArray
    }

  /** Concatenate fragment blobs into one continuous stream payload (the
    * shape GetMedia actually delivers: fragments back to back on one
    * connection). */
  val concatBlobs: UserDefinedFunction =
    udf { (blobs: Seq[Array[Byte]]) => Ebml.concat(blobs: _*) }

  final case class ElementInfo(name: String, size: Long, position: Long)

  /** Element walk with head positions (ebml.py Position semantics). */
  val parseElements: UserDefinedFunction =
    udf { (blob: Array[Byte]) =>
      Ebml.elements(blob).map(e => ElementInfo(
        if (e.name == null) f"0x${e.id}%x" else e.name, e.size, e.position))
    }

  /** First media block's frame payload (after the 4-byte SimpleBlock
    * header) — the "decode" input for the multimodal stub. */
  val firstBlock: UserDefinedFunction =
    udf { (blob: Array[Byte]) =>
      Ebml.blocks(blob).headOption
        .map(b => java.util.Arrays.copyOfRange(b, 4, b.length))
        .orNull
    }
}
