package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen Expression
  * (SQL name `jaro_winkler`) — the fuzzy-match primitive for entity
  * resolution / record linkage, which Spark has no built-in for (a
  * Scala UDF would leave whole-stage codegen and box both strings).
  *
  * Semantics are pinned to the CLASSIC Winkler convention so the
  * DuckDB oracle (`jaro_winkler_similarity`) reproduces the value
  * bit-for-bit (verified empirically over the full fixture pair set):
  *  - Jaro: match window ⌊max(|a|,|b|)/2⌋−1, left-to-right greedy
  *    matching, transpositions = half the out-of-order matches,
  *    j = (m/|a| + m/|b| + (m−t)/m) / 3;
  *  - Winkler prefix boost ONLY when j > 0.7 (the published
  *    threshold): jw = j + ℓ·0.1·(1−j) with ℓ = common prefix ≤ 4.
  * Equal strings short-circuit to 1.0; either empty → 0.0.
  *
  * Downstream queries must rank/filter on round(jaro_winkler(..), 4):
  * the arithmetic is a handful of IEEE double ops whose ORDER could
  * in principle differ across engines at the last ulp — the 4dp round
  * is the same membership guard the cosine top-k queries use. */
case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpression.jw(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerExpression.jw($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerExpression {
  /** static so generated code can call it */
  def jw(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of s1 vs matched chars of s2, in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    // classic Winkler: boost only above the 0.7 threshold
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(l1, l2))
    while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
