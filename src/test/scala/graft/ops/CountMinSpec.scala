package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CMS guarantees: never underestimates; overestimate bounded by the
  * table load; deterministic across runs (fixed hash layout). */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  test("cms estimates dominate exact counts within the epsilon bound") {
    val toks = graft.Tables.documents(spark, sf0001)
      .select(explode(split($"text", " ")).as("token"))
    val total = toks.count()
    val exact = toks.groupBy($"token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = UdafOps.cmsTokenFreq(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (tok, e) =>
      val ex = exact.getOrElse(tok, 0L)
      assert(e >= ex, s"$tok: underestimate $e < $ex")
      // classic bound: overshoot <= eps*N with eps = e/width, here loose 2x
      assert(e - ex <= 2 * math.ceil(math.E / UdafOps.CountMin.Width * total).toLong + 1,
        s"$tok: overshoot $e vs $ex (N=$total)")
    }
    val again = UdafOps.cmsTokenFreq(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est)
  }
}
