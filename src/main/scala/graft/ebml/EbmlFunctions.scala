package graft.ebml

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

/** Column-level EBML kernels (SURVEY §2A/§2G).
  *
  * `encodeFragment` builds a Kinesis-video-style MKV fragment per row:
  * EBML header, then a Segment carrying the AWS tag set the reference
  * extracts (parser.py:30-37) plus graft payload tags, then a Cluster with
  * one SimpleBlock holding the binary payload. `parseTags`/`parseElements`/
  * `firstBlock` are the reader side. Deterministic ⇒ the round-trip query
  * is oracle-checkable from the source rows alone.
  *
  * Since round 6 the column forms are native Catalyst expressions
  * ([[EbmlExpressions]]), not ScalaUDFs: same walk code, no per-row
  * CatalystTypeConverters / encoder reflection, whole-stage codegen
  * intact. Call syntax is unchanged.
  */
object EbmlFunctions {

  val FragmentNumber = "AWS_KINESISVIDEO_FRAGMENT_NUMBER"
  val ServerTs = "AWS_KINESISVIDEO_SERVER_TIMESTAMP"
  val ProducerTs = "AWS_KINESISVIDEO_PRODUCER_TIMESTAMP"
  val MillisBehind = "AWS_KINESISVIDEO_MILLIS_BEHIND_NOW"
  val ContinuationToken = "AWS_KINESISVIDEO_CONTINUATION_TOKEN"
  val UserIdTag = "GRAFT_USER_ID"
  val ValueCentsTag = "GRAFT_VALUE_CENTS"

  /** Composed-writer reference form of [[buildFragment]] — the readable
    * definition of the layout; kept for the spec's byte-identity pin. */
  def buildFragmentComposed(eventId: Long, tsMs: Long, userId: Long,
      valueC: Long, props: String): Array[Byte] = {
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

  /** Single-buffer encode: every element size is precomputed bottom-up
    * (fixed 8-byte size varints make that arithmetic), then each byte is
    * written exactly once — the composed form above copies each fragment
    * ~4× through its nesting levels, which at bench scale was ~1.5 s per
    * mm query. EbmlSpec pins the two byte-identical. */
  def buildFragment(eventId: Long, tsMs: Long, userId: Long, valueC: Long,
      props: String): Array[Byte] =
    buildFragmentFrame(eventId, tsMs, userId, valueC, Ebml.utf8(props))

  /** [[buildFragment]] with an ARBITRARY binary media payload in the
    * SimpleBlock — the shape a real image/video pipeline ships (opaque
    * codec bytes, not JSON); identical layout otherwise, so every
    * parser/splitter path is payload-agnostic. */
  def buildFragmentFrame(eventId: Long, tsMs: Long, userId: Long, valueC: Long,
      frame: Array[Byte]): Array[Byte] = {
    import Ebml._
    val docType = utf8("matroska")
    val names = Array(FragmentNumber, ServerTs, ProducerTs, MillisBehind,
      ContinuationToken, UserIdTag, ValueCentsTag).map(utf8)
    val values = Array(eventId.toString, tsMs.toString, tsMs.toString, "0",
      s"tok-$eventId", userId.toString, valueC.toString).map(utf8)
    // per-element payload sizes; overhead = idLen + 8-byte size varint
    def tagPayload(i: Int): Long =
      (10L + names(i).length) + (10L + values(i).length)
    val headerPayload = (10L + docType.length) + (10L + 1L)
    val tagsInner = 10L + names.indices.map(i => 10L + tagPayload(i)).sum
    val tags7373 = 10L + tagsInner
    val blockPayload = 4L + frame.length
    val clusterPayload = (9L + 8L) + (9L + blockPayload)
    val segPayload = (12L + tags7373) + (12L + clusterPayload)
    val total = (12L + headerPayload) + (12L + segPayload)
    val w = new Writer(new Array[Byte](total.toInt))
    w.head(0x1a45dfa3L, headerPayload)
    w.head(0x4282L, docType.length.toLong); w.bytes(docType)
    w.head(0x4285L, 1L); w.uint(2L, 1)
    w.head(0x18538067L, segPayload)
    w.head(0x1254c367L, tags7373)
    w.head(0x7373L, tagsInner)
    w.head(0x63c0L, 0L)
    var i = 0
    while (i < names.length) {
      w.head(0x67c8L, tagPayload(i))
      w.head(0x45a3L, names(i).length.toLong); w.bytes(names(i))
      w.head(0x4487L, values(i).length.toLong); w.bytes(values(i))
      i += 1
    }
    w.head(0x1f43b675L, clusterPayload)
    w.head(0xe7L, 8L); w.uint(tsMs, 8)
    w.head(0xa3L, blockPayload)
    // lacing-free SimpleBlock header: track vint, relative timecode 0, flags
    w.byte(0x81); w.byte(0); w.byte(0); w.byte(0x80)
    w.bytes(frame)
    w.buf
  }

  /** [[buildFragmentFrame]] with a Tracks element between Tags and
    * Cluster: one TrackEntry carrying TrackNumber / TrackUID /
    * TrackType, the CodecID string, and the codec's OUT-OF-BAND
    * CodecPrivate configuration — the layout a real Kinesis Video MKV
    * stream ships (the reference's EBML table lists CodecID and
    * CodecPrivate at ebml.py:47-48; libav reads AVC SPS/PPS and the
    * AAC AudioSpecificConfig from exactly this element). TrackType is
    * derived from the CodecID namespace: `A_*` → 2 (audio), else 1
    * (video), per the Matroska codec-id registry. Same single-buffer
    * write discipline as [[buildFragmentFrame]]. */
  def buildFragmentTrack(eventId: Long, tsMs: Long, userId: Long,
      valueC: Long, codecId: String, codecPrivate: Array[Byte],
      frame: Array[Byte]): Array[Byte] = {
    import Ebml._
    val docType = utf8("matroska")
    val cid = utf8(codecId)
    val trackType = if (codecId.startsWith("A_")) 2L else 1L
    val names = Array(FragmentNumber, ServerTs, ProducerTs, MillisBehind,
      ContinuationToken, UserIdTag, ValueCentsTag).map(utf8)
    val values = Array(eventId.toString, tsMs.toString, tsMs.toString, "0",
      s"tok-$eventId", userId.toString, valueC.toString).map(utf8)
    def tagPayload(i: Int): Long =
      (10L + names(i).length) + (10L + values(i).length)
    val headerPayload = (10L + docType.length) + (10L + 1L)
    val tagsInner = 10L + names.indices.map(i => 10L + tagPayload(i)).sum
    val tags7373 = 10L + tagsInner
    // TrackEntry children: TrackNumber(0xd7)=1, TrackUID(0x73c5)=user,
    // TrackType(0x83), CodecID(0x86), CodecPrivate(0x63a2)
    val trackEntryPayload = (9L + 1L) + (10L + 8L) + (9L + 1L) +
      (9L + cid.length) + (10L + codecPrivate.length)
    val tracksPayload = 9L + trackEntryPayload
    val blockPayload = 4L + frame.length
    val clusterPayload = (9L + 8L) + (9L + blockPayload)
    val segPayload =
      (12L + tags7373) + (12L + tracksPayload) + (12L + clusterPayload)
    val total = (12L + headerPayload) + (12L + segPayload)
    val w = new Writer(new Array[Byte](total.toInt))
    w.head(0x1a45dfa3L, headerPayload)
    w.head(0x4282L, docType.length.toLong); w.bytes(docType)
    w.head(0x4285L, 1L); w.uint(2L, 1)
    w.head(0x18538067L, segPayload)
    w.head(0x1254c367L, tags7373)
    w.head(0x7373L, tagsInner)
    w.head(0x63c0L, 0L)
    var i = 0
    while (i < names.length) {
      w.head(0x67c8L, tagPayload(i))
      w.head(0x45a3L, names(i).length.toLong); w.bytes(names(i))
      w.head(0x4487L, values(i).length.toLong); w.bytes(values(i))
      i += 1
    }
    w.head(0x1654ae6bL, tracksPayload)
    w.head(0xaeL, trackEntryPayload)
    w.head(0xd7L, 1L); w.uint(1L, 1)
    w.head(0x73c5L, 8L); w.uint(userId, 8)
    w.head(0x83L, 1L); w.uint(trackType, 1)
    w.head(0x86L, cid.length.toLong); w.bytes(cid)
    w.head(0x63a2L, codecPrivate.length.toLong); w.bytes(codecPrivate)
    w.head(0x1f43b675L, clusterPayload)
    w.head(0xe7L, 8L); w.uint(tsMs, 8)
    w.head(0xa3L, blockPayload)
    w.byte(0x81); w.byte(0); w.byte(0); w.byte(0x80)
    w.bytes(frame)
    w.buf
  }

  /** Encode one events row into an MKV fragment blob. */
  def encodeFragment(eventId: Column, tsMs: Column, userId: Column,
      valueC: Column, props: Column): Column =
    column(EbmlEncodeExpr(
      Seq(eventId, tsMs, userId, valueC, props).map(expression)))

  /** Encode with a binary media frame as the SimpleBlock payload. */
  def encodeFragmentFrame(eventId: Column, tsMs: Column, userId: Column,
      valueC: Column, frame: Column): Column =
    column(EbmlEncodeFrameExpr(
      Seq(eventId, tsMs, userId, valueC, frame).map(expression)))

  /** Encode with a Tracks element carrying (CodecID, CodecPrivate) —
    * the out-of-band codec-configuration fragment shape. */
  def encodeFragmentTrack(eventId: Column, tsMs: Column, userId: Column,
      valueC: Column, codecId: Column, codecPrivate: Column,
      frame: Column): Column =
    column(EbmlEncodeTrackExpr(
      Seq(eventId, tsMs, userId, valueC, codecId, codecPrivate, frame)
        .map(expression)))

  final case class TrackInfo(codec_id: String, codec_private: Array[Byte])

  /** First TrackEntry's (codec_id, codec_private), null when the
    * fragment carries no Tracks element — the read side of
    * [[buildFragmentTrack]] (ebml.py:47-48's rows). */
  def trackInfo(blob: Column): Column =
    column(EbmlTrackExpr(expression(blob)))

  val ErrorCode = "AWS_KINESISVIDEO_ERROR_CODE"
  val ErrorId = "AWS_KINESISVIDEO_ERROR_ID"

  final case class FragmentTags(
      fragment_number: String, server_ts: String, producer_ts: String,
      millis_behind: String, continuation_token: String,
      user_id: String, value_cents: String,
      error_code: String, error_id: String)

  /** Extract the AWS tag set from a fragment, including the error tags the
    * reference surfaces on stream faults (parser.py:352-366, 357-360). */
  def parseTags(blob: Column): Column = column(EbmlTagsExpr(expression(blob)))

  final case class FragmentSlice(position: Long, fragment: Array[Byte])

  /** Continuous-stream splitting (parser.py:362-375 boundary semantics):
    * one blob of concatenated fragments → per-fragment slices with the
    * absolute stream position of each fragment head. */
  def splitFragments(blob: Column): Column =
    column(EbmlSplitExpr(expression(blob)))

  /** Concatenate fragment blobs into one continuous stream payload (the
    * shape GetMedia actually delivers: fragments back to back on one
    * connection). */
  def concatBlobs(blobs: Column): Column =
    column(EbmlConcatExpr(expression(blobs)))

  final case class ElementInfo(name: String, size: Long, position: Long)

  /** Element walk with head positions (ebml.py Position semantics). */
  def parseElements(blob: Column): Column =
    column(EbmlElementsExpr(expression(blob)))

  /** CRC-32 integrity verdict (Matroska §CRC-32 / RFC 8794 §11.3.1):
    * false iff some master's leading CRC-32 element mismatches the
    * master payload behind it; true when all check out or none are
    * present. */
  def crcValid(blob: Column): Column =
    column(EbmlCrcValidExpr(expression(blob)))

  /** First media block's frame payload (after the 4-byte SimpleBlock
    * header) — the "decode" input for the multimodal stub. */
  def firstBlock(blob: Column): Column =
    column(EbmlFirstBlockExpr(expression(blob)))
}
