package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 seventh wave: independent Scala replays for one-way
  * ANOVA, polynomial-kernel MMD (checked against the BRUTE-FORCE
  * pairwise kernel sum — the algebraic collapse must agree with the
  * thing it collapsed), Brown–Forsythe Levene, the Newey–West HAC
  * standard error, and seasonal/trend strength. */
class Wave14gSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  private lazy val docsRaw: Seq[(String, Long)] =
    graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  private def anovaF(groups: Map[String, Seq[Long]]): (Long, Long, Double, Double) = {
    val k = groups.size.toLong
    val nn = groups.values.map(_.size).sum.toLong
    val ss = groups.values.flatten.sum
    val sq = groups.values.flatten.map(x => x * x).sum
    val ssbRaw = groups.values
      .map(g => r6(g.sum.toDouble * g.sum.toDouble / g.size)).sum.toDouble
    val grand = ss.toDouble * ss.toDouble / nn
    val (ssb, sst) = (ssbRaw - grand, sq.toDouble - grand)
    val f = (ssb / (k - 1)) / ((sst - ssb) / (nn - k))
    (nn, k, f, ssb / sst)
  }

  test("q_quality_anova_oneway: moment replay") {
    val groups = docsRaw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (nn, k, f, eta) = anovaF(groups)
    val row = QualityOps.anovaOneway(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3)) === ((nn, k, micro(f), micro(eta))))
  }

  test("q_quality_mmd_poly: moment form == brute-force kernel sum") {
    val xs = docsRaw.filter(_._1 == "src0").map(_._2.toDouble)
    val ys = docsRaw.filter(_._1 == "src1").map(_._2.toDouble)
    def kern(a: Double, b: Double): Double = {
      val v = 1.0 + a * b / 1e6; v * v
    }
    def vMean(as: Seq[Double], bs: Seq[Double]): Double =
      (for (a <- as; b <- bs) yield kern(a, b)).sum / (as.size * bs.size)
    val brute = vMean(xs, xs) + vMean(ys, ys) - 2.0 * vMean(xs, ys)
    val muGap = xs.sum / xs.size - ys.sum / ys.size
    val m2Gap = xs.map(x => x * x).sum / xs.size -
      ys.map(y => y * y).sum / ys.size
    val closed = 2.0 * muGap * muGap / 1e6 + m2Gap * m2Gap / 1e12
    assert(math.abs(brute - closed) < 1e-6) // the algebraic collapse
    val row = QualityOps.mmdPoly(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4)) ===
      ((xs.size.toLong, ys.size.toLong, micro(muGap), micro(m2Gap),
        micro(closed))))
  }

  test("q_quality_levene_bf: median-z replay") {
    val groups = docsRaw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val zGroups = groups.map { case (s, xs) =>
      val med = xs.sorted.apply((xs.size + 1) / 2 - 1) // lower median
      s -> xs.map(x => math.abs(x - med))
    }
    val (nn, k, f, _) = anovaF(zGroups)
    val row = QualityOps.leveneBf(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2)) ===
      ((nn, k, micro(f))))
  }

  private lazy val dailyRev: Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.to_date
    graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").cast("string"), $"o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(o => cents(o._2)).sum)
      .toSeq.sortBy(_._1)
  }

  test("q_window_newey_west: autocovariance replay") {
    val xs = dailyRev.map(_._2)
    val n = xs.length.toLong
    val s = xs.sum
    val u = xs.map(x => BigInt(n * x - s))
    def gamma(k: Int): BigInt =
      (k until xs.length).map(t => u(t) * u(t - k)).sum
    val n3 = n.toDouble * n * n
    val g0 = gamma(0).toDouble / n3
    val lrv = (1 to 7).foldLeft(g0) { (acc, k) =>
      acc + 2.0 * (1.0 - k / 8.0) * (gamma(k).toDouble / n3)
    }
    val row = WindowOps.neweyWest(spark, sf0001).collect().head
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4)) ===
      ((n, micro(s.toDouble / n / 100.0), micro(math.sqrt(g0 / n) / 100.0),
        micro(math.sqrt(lrv / n) / 100.0),
        micro(math.sqrt(lrv / n) / math.sqrt(g0 / n)))))
  }

  test("q_window_stl_strength: variance-ratio replay") {
    val days = dailyRev.map { case (d, r) =>
      (java.time.LocalDate.parse(d), r) }
    val n = days.length
    // centered rows-based 7-window over the gap-agnostic day SEQUENCE
    val full = (3 until n - 3).map { i =>
      val t7 = (i - 3 to i + 3).map(j => days(j)._2).sum
      val dow = days(i)._1.getDayOfWeek.getValue.toLong
      (dow, days(i)._2, t7)
    }
    val seas = full.groupBy(_._1).view.mapValues { g =>
      (g.map(x => x._2 * 7L - x._3).sum, g.size.toLong) }.toMap
    var (r1, r2, sr1, sr2, tr1, tr2) = (BigDecimal(0), BigDecimal(0),
      BigDecimal(0), BigDecimal(0), BigDecimal(0), BigDecimal(0))
    for ((dow, rev, t7) <- full) {
      val tr = t7.toDouble / 7.0
      val (snum, scnt) = seas(dow)
      val se = snum.toDouble / (7.0 * scnt)
      val re = rev.toDouble - tr - se
      r1 += r6(re); r2 += r6(re * re)
      sr1 += r6(se + re); sr2 += r6((se + re) * (se + re))
      tr1 += r6(tr + re); tr2 += r6((tr + re) * (tr + re))
    }
    val m = full.size.toDouble
    def varOf(s1: BigDecimal, s2: BigDecimal): Double =
      s2.toDouble / m - (s1.toDouble / m) * (s1.toDouble / m)
    val fs = math.max(0.0, 1.0 - varOf(r1, r2) / varOf(sr1, sr2))
    val ft = math.max(0.0, 1.0 - varOf(r1, r2) / varOf(tr1, tr2))
    val row = WindowOps.stlStrength(spark, sf0001).collect().head
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2)) ===
      ((full.size.toLong, micro(fs), micro(ft))))
  }
}
