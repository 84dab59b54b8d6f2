package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-13 eighth wave: independent replays (established convention). */
class Wave13hSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  test("q_ml_nelson_aalen: hand-summed hazard; Breslow >= KM pointwise") {
    import org.apache.spark.sql.functions._
    val per = graft.Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(min(to_date($"o_orderdate")).as("f"),
        max(to_date($"o_orderdate")).as("l"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val m = per.map(_._2).maxBy(_.toEpochDay)
    val durs = per.map { case (f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l),
        java.time.temporal.ChronoUnit.DAYS.between(l, m) > 90) }
    val cells = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, g) =>
      (dur, g.count(_._2).toLong, g.count(!_._2).toLong) }
    var atRisk = durs.length.toLong
    var chaz = BigDecimal(0)
    val expected = cells.flatMap { case (dur, d, c) =>
      val row = if (d > 0) {
        chaz += r6(d.toDouble / atRisk)
        Some((dur, atRisk, d, chaz.toDouble,
          micro(math.exp(-chaz.toDouble))))
      } else None
      atRisk -= (d + c)
      row
    }
    val got = graft.SparkEntry.queries("q_ml_nelson_aalen")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the Breslow estimate dominates KM pointwise (1 − x ≤ e^−x),
    // equality only in the small-hazard limit — a cross-estimator
    // consistency check over the SAME event table
    val km = graft.SparkEntry.queries("q_ml_kaplan_meier")(spark, sf0001)
      .select($"dur_days", $"surv").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (dur, _, _, _, breslow) =>
      assert(breslow >= km(dur) - 1e-6, s"dur=$dur")
    }
  }

  test("q_quality_theil_index: direct replay; decomposition is exact") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    val s = docs.map(_._2).sum
    val st = docs.map { case (_, x) =>
      x * r6(math.log((x * n).toDouble / s.toDouble)) }.sum
    val grp = docs.groupBy(_._1)
    val sb = grp.values.map { g =>
      val sg = g.map(_._2).sum; val ng = g.length.toLong
      sg * r6(math.log((sg * n).toDouble / (ng * s).toDouble))
    }.sum
    val row = graft.SparkEntry.queries("q_quality_theil_index")(
      spark, sf0001).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == grp.size)
    assert(row.getDouble(2) == micro(st.toDouble / s))
    assert(row.getDouble(3) == micro(sb.toDouble / s))
    assert(row.getDouble(4) == micro((st - sb).toDouble / s))
    // the decomposition is the point: between + within == total by
    // construction, and BOTH parts are non-degenerate on the fixture
    assert(row.getDouble(2) > 0 && row.getDouble(4) > 0)
    assert(row.getDouble(3) != 0.0)
  }

  test("q_text_heaps_fit: OLS replay; beta in the sublinear band") {
    val toks = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val pts = toks.groupBy(_._1).values.map { g =>
      (r6(math.log(g.length.toDouble)),
        r6(math.log(g.map(_._2).distinct.length.toDouble)))
    }.toSeq
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => (p._1 * p._1)).sum.toDouble
    val syy = pts.map(p => (p._2 * p._2)).sum.toDouble
    val sxy = pts.map(p => (p._1 * p._2)).sum.toDouble
    val vxx = sxx - sx * sx / n
    val vyy = syy - sy * sy / n
    val vxy = sxy - sx * sy / n
    val row = graft.SparkEntry.queries("q_text_heaps_fit")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == pts.length)
    assert(row.getDouble(1) == micro(vxy / vxx))
    assert(row.getDouble(2) == micro((sy - (vxy / vxx) * sx) / n))
    assert(row.getDouble(3) == micro(vxy * vxy / (vxx * vyy)))
    // Heaps' β is sublinear on a real vocabulary-growth curve
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 1.0)
  }
}
