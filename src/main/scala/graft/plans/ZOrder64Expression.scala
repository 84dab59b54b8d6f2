package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** zorder64(a, b) — 2-D Z-order (Morton) interleave of the low 31 bits
  * of two non-negative longs (Morton, "A computer oriented geodetic data
  * base...", IBM 1966; the standard multi-dimensional clustering key in
  * analytic stores). Sorting a table by zorder64(x, y) gives every
  * storage chunk a TIGHT min/max envelope in BOTH columns at once, so a
  * conjunctive range predicate (x BETWEEN … AND y BETWEEN …) lets
  * parquet row-group stats skip almost everything — single-column sort
  * can only do that for its leading column. ZOrderSpec measures exactly
  * this: the same filter over the same rows delivers a fraction of the
  * row-group rows from a z-sorted file vs an arrival-ordered one.
  *
  * Bit spreading uses the magic-mask ladder (public-domain "Interleave
  * bits by Binary Magic Numbers", Stanford Bit Twiddling Hacks) — five
  * shift-and-mask steps per operand, branch-free, inside whole-stage
  * codegen via the static [[ZOrder64Expression.morton2]]. Inputs are
  * masked to 31 bits (callers bucket wider domains first); the result
  * uses 62 bits and stays non-negative, so longs compare correctly.
  */
case class ZOrder64Expression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 needs (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql}) — cast first")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64Expression.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.ZOrder64Expression.morton2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder64"
}

object ZOrder64Expression {
  /** Spread the low 31 bits of v to even bit positions (static so
    * generated code can call it). */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def morton2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
