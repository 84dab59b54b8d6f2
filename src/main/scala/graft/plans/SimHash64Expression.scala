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
  * Two token-hash modes, same vote/pack semantics:
  *  - `portable = false` (SQL name `simhash64`): token hash is
  *    XxHash64Function.hash(token, StringType, 42) — BIT IDENTICAL to
  *    Spark SQL's xxhash64(token). The fastest mode and the 100 TB
  *    default, but xxhash64 is not reproducible in DuckDB, so queries
  *    built on it are rows-only checkable.
  *  - `portable = true` (SQL name `simhash64_sha`): token hash is the
  *    first 8 bytes of SHA-256(token), big-endian — exactly what DuckDB
  *    computes as `CAST(('0x' || substr(sha256(tok),1,16)) AS UBIGINT)`
  *    (same bit pattern; Java long is the signed view). This is the
  *    engine-neutral-hash precedent of q_ml_hashing_tf_sql applied to
  *    simhash, and is what gives q_dedup_simhash a full value oracle.
  *
  * Term frequency weights votes exactly like the duplicate-token
  * semantics of the old transform() version; a tied bit (vote == 0)
  * packs as 0 in both modes. */
case class SimHash64Expression(child: Expression, portable: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expression.simhash(input.asInstanceOf[UTF8String], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHash64Expression.simhash($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String =
    if (portable) "simhash64_sha" else "simhash64"
}

object SimHash64Expression {
  private val sha = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** First 8 bytes of SHA-256(token), big-endian — the signed-long view
    * of the bit pattern DuckDB parses from the first 16 hex chars. */
  private def sha64(tok: String): Long = {
    val md = sha.get()
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** static so generated code can call it */
  def simhash(text: UTF8String, portable: Boolean): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h =
        if (portable) sha64(toks(t))
        else XxHash64Function.hash(
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
