package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector kernels.
  *
  * These stay inside whole-stage codegen and read doubles straight out of
  * the Tungsten array format — no per-element boxing, no UDF
  * serialization. On the O(n²) pair queries (dedup_embed, ann_*) this is
  * the difference between minutes and sub-second at bench scale.
  *
  * Accumulation is a strict left fold, bit-identical to the DuckDB
  * oracle's list_reduce.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // callers guarantee array<double> inputs (operators cast explicitly)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm of a double array — same strict left fold as the
  * oracle's list_reduce of x*x. */
case class Norm2(child: Expression) extends UnaryExpression {
  // caller guarantees array<double> input
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { s += x.getDouble(i) * x.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        double $s = 0.0;
        for (int $i = 0; $i < $a.numElements(); $i++) {
          $s += $a.getDouble($i) * $a.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Norm2 =
    copy(child = newChild)
}

/** Session-level registration so operators can reach the native expressions
  * through `call_function` without touching private Column constructors. */
object VectorFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_norm2",
      exprs => Norm2(exprs.head), "built-in")
  }
}
