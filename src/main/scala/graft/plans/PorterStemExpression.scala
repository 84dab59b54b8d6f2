package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Porter2/Snowball stemming — the §4.3
  * "optional codegen upgrade" of the mandatory stemmer UDF (reference D13,
  * 00_training_pipeline.py:61).
  *
  * vs. a Scala UDF: no ScalaUDF wrapper, no catalyst<->Scala converters, no
  * closure serialization per task, and it participates in whole-stage
  * codegen (the generated code calls the static stemmer directly), so a
  * stem inside a projection chain no longer breaks the codegen span.
  */
case class PorterStemExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.Porter2.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.Porter2.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "porter_stem"
}
