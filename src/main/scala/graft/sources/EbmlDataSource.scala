package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ebml.{Ebml, EbmlFunctions}

/** Batch DataSourceV2: `spark.read.format("ebml").load(dir)` over a
  * directory of GetMedia payload captures — the archive analog of the
  * reference's live connection (parser.py:272-310). Each payload file
  * holds one or more back-to-back MKV fragments; the source splits them
  * at EBML header boundaries (parser.py:362-375) and emits one row per
  * FRAGMENT with its provenance (file, absolute position), its parsed
  * AWS tag set (parser.py:30-37), and optionally the raw bytes.
  *
  * Scale design:
  *  - files are listed once on the driver and BIN-PACKED into input
  *    partitions of ~`maxPartitionBytes`, so a million-file archive
  *    prefix fans out across executors without one task per tiny file;
  *  - COLUMN PRUNING is real work avoidance, not cosmetics: the tag
  *    walk runs only if a tag column is required, the element walk only
  *    for `n_elements`, and the fragment bytes are copied into the row
  *    only if `blob` is required — a metadata-only query over a media
  *    archive never materializes media bytes into rows;
  *  - readers open files through the Hadoop filesystem API with the
  *    session's Hadoop configuration (serialized into the reader
  *    factory), so the same code reads local disk, HDFS, or an object
  *    store.
  */
class EbmlDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ebml"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EbmlTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "ebml source requires a single directory or file path: .load(dir)")
    // capture the OWNING session's Hadoop conf here, at resolution time
    // on its planning thread — resolving SparkSession.active later
    // inside the scan can pick up a different thread's session in
    // multi-session applications (round-4 self-review finding)
    new EbmlTable(path, HadoopConfShip.capture(SparkSession.active))
  }
}

object EbmlTable {
  /** One row per fragment. Tag columns are null when a fragment lacks
    * the tag — e.g. non-AWS test media. */
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("position", LongType, nullable = false),
    StructField("frag_len", LongType, nullable = false),
    StructField("fragment_number", LongType, nullable = true),
    StructField("producer_ts", LongType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("millis_behind", LongType, nullable = true),
    StructField("continuation_token", StringType, nullable = true),
    StructField("n_elements", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))
}

class EbmlTable(path: String, confEntries: Array[(String, String)])
    extends Table with SupportsRead {
  override def name(): String = s"ebml:$path"
  override def schema(): StructType = EbmlTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EbmlScanBuilder(path,
      Option(options.get("maxPartitionBytes")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024), confEntries)
}

class EbmlScanBuilder(path: String, maxPartitionBytes: Long,
    confEntries: Array[(String, String)])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EbmlTable.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new EbmlScan(path, required, maxPartitionBytes, confEntries)
}

/** A bin-packed slice of the file listing: parallel arrays keep the
  * partition Java-serializable without Hadoop types. */
case class EbmlInputPartition(files: Array[String]) extends InputPartition

class EbmlScan(path: String, required: StructType, maxPartitionBytes: Long,
    confEntries: Array[(String, String)])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"ebml $path, ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side listing with the OWNING session's Hadoop conf
    // (credentials, endpoints), captured at getTable time; recurses
    // nested capture prefixes
    val conf = HadoopConfShip.rebuild(confEntries)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = ArrayBuffer.empty[(String, Long)]
    def list(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) list(st.getPath)
      else if (!st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
        files += ((st.getPath.toString, st.getLen))
    }
    list(root)
    // greedy SEQUENTIAL fill by descending size: bounds partition bytes
    // while keeping task count ~ totalBytes / maxPartitionBytes — a
    // million-fragment archive does not become a million tasks. A bin
    // closes as soon as the next (no-larger) file doesn't fit, so
    // planning is the O(n log n) sort — the earlier first-fit scanned
    // every open bin per file (O(files × bins) ≈ 1e10 comparisons at
    // the scaladoc's 1e6-file archive: a multi-minute single-threaded
    // driver stall before the first task launched). Oversized single
    // files still get a bin of their own.
    val bins = ArrayBuffer.empty[Array[String]]
    val cur = ArrayBuffer.empty[String]
    var curLen = 0L
    files.sortBy(-_._2).foreach { case (f, len) =>
      if (cur.nonEmpty && curLen + len > maxPartitionBytes) {
        bins += cur.toArray; cur.clear(); curLen = 0L
      }
      cur += f; curLen += len
    }
    if (cur.nonEmpty) bins += cur.toArray
    bins.map(b => EbmlInputPartition(b): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // executors rebuild the captured conf per task (HadoopConfShip), so
    // they open object-store paths with the same credentials the
    // driver listed them with
    EbmlReaderFactory(required.fieldNames, confEntries)
}

case class EbmlReaderFactory(columns: Array[String],
    confEntries: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EbmlPartitionReader(partition.asInstanceOf[EbmlInputPartition], columns, confEntries)
}

class EbmlPartitionReader(partition: EbmlInputPartition,
    columns: Array[String], confEntries: Array[(String, String)])
  extends PartitionReader[InternalRow] {

  private lazy val conf: Configuration = HadoopConfShip.rebuild(confEntries)
  // pruning decisions: which walks this scan actually pays for
  private val needTags = columns.exists(Set("fragment_number", "producer_ts",
    "user_id", "millis_behind", "continuation_token"))
  private val needElements = columns.contains("n_elements")
  private val needBlob = columns.contains("blob")

  private var fileIdx = 0
  private var frags: Seq[(Long, Array[Byte])] = Seq.empty
  private var fragIdx = 0
  private var curPath: UTF8String = _
  private var row: InternalRow = _

  private def openNextFile(): Boolean = {
    if (fileIdx >= partition.files.length) return false
    val p = new Path(partition.files(fileIdx))
    fileIdx += 1
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    // whole-payload read: a payload file is seconds of media (the unit
    // GetMedia delivers between continuation tokens), not an archive —
    // multi-GB captures must be re-chunked upstream, as with the
    // streaming FragmentSource. FAIL LOUDLY past the array limit: the
    // old len.toInt would silently truncate a >2 GB payload and drop
    // its tail fragments (round-4 self-review finding)
    require(len <= Int.MaxValue.toLong,
      s"ebml payload file too large to buffer (${len} B > 2 GB): $p — " +
        "re-chunk captures upstream")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    curPath = UTF8String.fromString(p.toString)
    frags = Ebml.splitFragments(buf)
    fragIdx = 0
    true
  }

  override def next(): Boolean = {
    while (fragIdx >= frags.length) if (!openNextFile()) return false
    val (pos, frag) = frags(fragIdx)
    fragIdx += 1
    val tags: Map[String, String] =
      if (needTags) Ebml.tags(frag) else Map.empty
    def tagLong(name: String): Any =
      tags.get(name).map(v => java.lang.Long.valueOf(v.toLong)).orNull
    val values = columns.map {
      case "path" => curPath
      case "position" => pos
      case "frag_len" => frag.length.toLong
      case "fragment_number" => tagLong(EbmlFunctions.FragmentNumber)
      case "producer_ts" => tagLong(EbmlFunctions.ProducerTs)
      case "user_id" => tagLong(EbmlFunctions.UserIdTag)
      case "millis_behind" => tagLong(EbmlFunctions.MillisBehind)
      case "continuation_token" =>
        tags.get(EbmlFunctions.ContinuationToken)
          .map(UTF8String.fromString).orNull
      case "n_elements" =>
        if (needElements) Ebml.elements(frag).length.toLong else 0L
      case "blob" => if (needBlob) frag else null
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    row = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
