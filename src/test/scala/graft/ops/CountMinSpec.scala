package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CMS guarantees, pinned for BOTH hash layouts (seeded-FNV scale
  * default and the sha256-slice portable mode the declared query +
  * DuckDB oracle use): never underestimates; overestimate bounded by
  * the table load; deterministic across runs (fixed hash layout). */
class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  for (portable <- Seq(false, true))
    test(s"cms estimates dominate exact counts within the epsilon bound (portable=$portable)") {
      val toks = graft.Tables.documents(spark, sf0001)
        .select(explode(split($"text", " ")).as("token"))
      val total = toks.count()
      val exact = toks.groupBy($"token").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val est = UdafOps.cmsTokenFreqWith(spark, sf0001, portable)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      est.foreach { case (tok, e) =>
        val ex = exact.getOrElse(tok, 0L)
        assert(e >= ex, s"$tok: underestimate $e < $ex")
        // classic bound: overshoot <= eps*N with eps = e/width, here loose 2x
        assert(e - ex <= 2 * math.ceil(math.E / UdafOps.CountMin.Width * total).toLong + 1,
          s"$tok: overshoot $e vs $ex (N=$total)")
      }
      val again = UdafOps.cmsTokenFreqWith(spark, sf0001, portable)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(again == est)
    }
}
