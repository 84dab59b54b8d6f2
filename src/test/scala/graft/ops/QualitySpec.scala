package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-anonymity audit semantics against a driver-side reference. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("k-anonymity flags exactly the sub-k quasi-identifier groups") {
    val got = QualityOps.kAnonymity(spark, sf0001)
      .select("event_type", "day", "value_band", "n_users", "n_rows")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val rows = graft.Tables.events(spark, sf0001)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        floor($"value" / 10).cast("long").as("vb"), $"user_id")
      .as[(String, String, Long, Long)].collect()
    val want = rows.groupBy(r => (r._1, r._2, r._3))
      .map { case ((t, d, vb), xs) =>
        (t, d, vb, xs.map(_._4).distinct.length.toLong, xs.length.toLong)
      }
      .filter(_._4 < 5).toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < rows.length,
      "audit must be non-vacuous and selective at sf0.001")
  }

  test("IQR outlier audit matches a driver-side Tukey-fence recompute") {
    val got = QualityOps.outlierIqr(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val rows = graft.Tables.events(spark, sf0001)
      .select($"event_type", $"value").as[(String, Double)].collect()
    def q(sorted: Array[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < sorted.length)
        sorted(lo) + frac * (sorted(lo + 1) - sorted(lo))
      else sorted(lo)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r2(x: Double) = BigDecimal(x)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rows.groupBy(_._1).flatMap { case (t, xs) =>
      val vs = xs.map(_._2).sorted
      val (q1, q3) = (r6(q(vs, 0.25)), r6(q(vs, 0.75)))
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      val out = vs.filter(v => v < lo || v > hi)
      if (out.isEmpty) None
      else Some((t, out.length.toLong, r2(out.min), r2(out.max)))
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "fence audit must be non-vacuous at sf0.001")
  }

  test("profile reports every (column, metric) cell with sane values") {
    val rows = QualityOps.profile(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.length == 13)
    // fixture has no nulls -> completeness exactly 1.0 everywhere
    rows.filter(_._2 == "completeness").foreach { case (c, _, v) =>
      assert(v == 1.0, s"$c completeness $v") }
    val m = rows.map(r => (r._1, r._2) -> r._3).toMap
    val nOrders = graft.Tables.orders(spark, sf0001).count().toDouble
    assert(m(("o_orderkey", "n_distinct")) == nOrders)
    assert(m(("o_totalprice", "min")) <= m(("o_totalprice", "mean")) &&
      m(("o_totalprice", "mean")) <= m(("o_totalprice", "max")))
  }

  test("l-diversity flags exactly the sub-l cohort-day groups") {
    import spark.implicits._
    val got = QualityOps.lDiversity(spark, sf0001)
      .select("event_type", "day", "cohort", "l_bands")
      .as[(String, java.sql.Date, Long, Long)].collect()
      .map { case (e, d, c, l) => (e, d.toString, c) -> l }.toMap
    val want = graft.Tables.events(spark, sf0001)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day",
        "user_id % 100 AS cohort", "CAST(floor(value / 10) AS LONG) AS band")
      .as[(String, java.sql.Date, Long, Long)].collect()
      .groupBy { case (e, d, c, _) => (e, d.toString, c) }
      .map { case (k, rows) => k -> rows.map(_._4).distinct.length.toLong }
      .filter(_._2 < 3)
    assert(got == want)
    assert(want.nonEmpty, "fixture must be non-vacuous at sf0.001")
  }

  test("PSI drift is complete over deciles and near zero on a parity split") {
    val rows = QualityOps.psiDrift(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq == (0 to 9), "all 10 buckets")
    val (pSum, qSum) = (rows.map(_._2).sum, rows.map(_._3).sum)
    assert(math.abs(pSum - 1.0) < 0.01 && math.abs(qSum - 1.0) < 0.01)
    // even/odd days of the same generator: distributions agree -> stable
    val psi = rows.map(_._4).sum
    assert(psi >= 0.0 - 1e-9 && psi < 0.1, s"parity-split PSI $psi")
  }
}
