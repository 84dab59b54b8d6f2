package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text in ONE pass (north star
  * dedup; SURVEY.md §2.4). Replaces the split -> transform(xxhash64) ->
  * vote-UDF chain: no token array materialization, no Seq[Long] boxing,
  * and the whole computation stays inside whole-stage codegen.
  *
  * Token hashing is XxHash64Function.hash(token, StringType, 42) — BIT
  * IDENTICAL to Spark SQL's xxhash64(token), so the fingerprints match
  * the previous formulation and DedupSpec's planted-distance pins hold.
  * Term frequency weights votes exactly like the duplicate-token
  * semantics of the old transform() version. */
case class SimHash64Expression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expression.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHash64Expression.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64Expression {
  /** static so generated code can call it */
  def simhash(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = XxHash64Function.hash(
        UTF8String.fromString(toks(t)), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}
