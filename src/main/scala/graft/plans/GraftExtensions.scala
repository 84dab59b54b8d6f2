package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native expressions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions route for spark-submit users);
  *  - `GraftExtensions.register(spark)` at runtime (idempotent) — used by
  *    the declared queries so they work against ANY session the driver
  *    hands us, extensions configured or not.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => RewriteTopKWindow)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("porter_stem",
      new ExpressionInfo(classOf[PorterStemExpression].getName, "porter_stem"),
      (args: Seq[Expression]) => PorterStemExpression(args.head)),
    ("dot_f32",
      new ExpressionInfo(classOf[DotProductExpression].getName, "dot_f32"),
      (args: Seq[Expression]) => DotProductExpression(args(0), args(1))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64Expression].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64Expression(args.head)),
    ("simhash64_sha",
      new ExpressionInfo(classOf[SimHash64Expression].getName, "simhash64_sha"),
      (args: Seq[Expression]) => SimHash64Expression(args.head, portable = true)),
    ("zorder64",
      new ExpressionInfo(classOf[ZOrder64Expression].getName, "zorder64"),
      (args: Seq[Expression]) => ZOrder64Expression(args(0), args(1))),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinklerExpression].getName, "jaro_winkler"),
      (args: Seq[Expression]) => JaroWinklerExpression(args(0), args(1))))

  /** Idempotent runtime registration into an existing session. */
  def register(spark: SparkSession): Unit = {
    // once per session: createOrReplaceTempFunction logs a WARN per
    // function on every re-replace, and register() runs per query
    // entry — 8 functions x 347 queries spammed every Verify/Bench log
    // (r16 verdict item). Re-registering was always a semantic no-op
    // (same builders), so a session-scoped guard is enough; keyed on
    // the registry so a fresh sessionState (newSession/cloneSession)
    // registers again.
    val registry = spark.sessionState.functionRegistry
    if (registered.add(registry)) {
      functions.foreach { case (name, _, builder) =>
        registry.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    }
    RewriteTopKWindowInstaller.install(spark)
  }

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
        java.lang.Boolean])
}
