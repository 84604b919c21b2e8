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
