package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native float-array dot product (SURVEY.md §2.4 similarity search;
  * preference order (b): custom Catalyst Expression over a Scala UDF).
  *
  * vs. the UDF it replaces: operates directly on ArrayData (no
  * catalyst->Seq[Float] conversion, no per-element boxing, no closure
  * ship) and participates in whole-stage codegen via a static-method
  * call. The fold is the SAME left-to-right promote-to-double loop as
  * the UDF and DuckDB's list_dot_product(CAST(...AS DOUBLE[])) — the
  * oracle hash-match depends on that bit-for-bit.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpression.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.DotProductExpression.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object DotProductExpression {
  /** static so generated code can call it; elements must be non-null
    * float32 (the embeddings contract, FIXTURES.md) */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }
}
