package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of `array<double>` rows as a mergeable aggregate:
  * each task folds its partition into ONE dim-length buffer, and the
  * exchange carries only those partials — k×dim doubles per task —
  * instead of rows.
  *
  * Motivation (r3 verdict #3): Lloyd's means recompute used
  * posexplode(v) → groupBy(cid, dim) → avg, inflating every corpus row
  * into dim (cid, dim, x) rows BEFORE the exchange — 64× the row count
  * and ~3× the vector bytes shuffled per iteration; at 100 TB every
  * k-means round re-shuffled a multiple of the dataset. With this
  * aggregate the per-iteration exchange is a few KB per task regardless
  * of corpus size — the correct distributed k-means shape.
  *
  * Accumulation order follows partition order (like every distributed
  * float sum, including the avg() it replaces); consumers are
  * fixpoint-checked model fits, not oracle-exact queries. Rows are
  * assumed equal-length (one embedding column); a shorter row would
  * raise the same error the posexplode form produced as a wrong mean.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vec_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val acc = if (buf == null) new Array[Double](n) else buf
      var i = 0
      while (i < n && i < acc.length) { acc(i) += arr.getDouble(i); i += 1 }
      acc
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a == null) b
    else if (b == null) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  // one tag byte ahead of the payload: a group whose rows are ALL
  // zero-length arrays holds a zero-length (non-null) buffer, which a
  // bare empty-bytes encoding would collapse into the null (no input)
  // case after a shuffle-exchanged partial — the no-shuffle path
  // returns an empty array for it, and the two paths must agree
  override def serialize(buf: Array[Double]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = ByteBuffer.allocate(1 + buf.length * 8)
      bb.put(1: Byte)
      var i = 0
      while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val bb = ByteBuffer.wrap(bytes)
      bb.get() // non-null tag
      val out = new Array[Double]((bytes.length - 1) / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/** Frequent-items (Misra–Gries / SpaceSaving family) top-k summary as a
  * mergeable TypedImperativeAggregate — the third classic sketch next
  * to HLL (C10b) and KLL (C10c). Each task folds its partition into a
  * bounded map of at most `capacity` (term, count) entries; the
  * exchange carries only those partials, so a global heavy-hitters
  * query over 100 TB of terms shuffles O(tasks × capacity) bytes
  * instead of the full distinct-term space (the groupBy form shuffles
  * every distinct term to its reducer — fine for a 31-word toy corpus,
  * ruinous for a trillion-token web corpus).
  *
  * Guarantees (Misra–Gries, Berinde et al. 2010 for the merge):
  * reported counts are LOWER bounds; true_count - count <= N/capacity
  * where N is the stream length, and every item with true frequency
  * > N/capacity is present in the summary. When capacity >= distinct
  * items the summary IS the exact count table — the driver oracle
  * query runs in that regime (capacity 1024 vs 31 distinct corpus
  * terms), so the gate is hash-exact while the operator's scale
  * behavior stays sketch-shaped; the approximation regime is
  * spec-covered on planted skew.
  *
  * Merge: pointwise sum, then (if over capacity) subtract the
  * (capacity+1)-th largest combined count from every entry and drop
  * the non-positive remainder — the standard bound-preserving MG merge.
  * Under-capacity merges are order-independent (plain sums); the
  * over-capacity regime inherits partition-order dependence like every
  * distributed sketch (documented, spec'd exact only when unsaturated).
  *
  * eval() returns array<struct<term string, cnt long>> sorted by
  * (cnt desc, term asc) — deterministic presentation for the exact
  * regime's oracle gate. */
case class TopKFreq(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
  import org.apache.spark.unsafe.types.UTF8String

  override def prettyName: String = "graft_topk_freq"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val term = v.asInstanceOf[UTF8String].toString
    val cur = buf.get(term)
    if (cur != 0L || buf.containsKey(term)) buf.put(term, cur + 1L)
    else if (buf.size < capacity) buf.put(term, 1L)
    else {
      // Misra–Gries decrement step: all counters down one, zeros evicted
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val bit = b.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue)
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop <= 0
      val counts = new Array[Long](a.size)
      var i = 0
      val cit = a.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val thresh = counts(a.size - capacity - 1)
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= thresh) it.remove()
        else e.setValue(e.getValue - thresh)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    if (buf == null) return null
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      bytes += 4 + e.getKey.getBytes("UTF-8").length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes("UTF-8")
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, "UTF-8"), bb.getLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKFreq =
    copy(child = newChild)
}
