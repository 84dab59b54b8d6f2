package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 ninth wave: independent Scala replays for Kruskal–Wallis
  * across weekdays, the Ljung–Box portmanteau test, and Cliff's delta
  * (checked by BRUTE-FORCE pair counting against the histogram
  * form). */
class Wave14iSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  private lazy val dailyRev: Seq[(String, Long)] = {
    import org.apache.spark.sql.functions.to_date
    graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").cast("string"), $"o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(o => cents(o._2)).sum)
      .toSeq.sortBy(_._1)
  }

  test("q_window_kruskal_dow: tie-safe rank replay") {
    val rows = dailyRev.map { case (d, rev) =>
      (java.time.LocalDate.parse(d).getDayOfWeek.getValue.toLong, rev) }
    val n = rows.length.toLong
    val sorted = rows.map(_._2).sorted
    def ar2(v: Long): Long =
      (sorted.indexOf(v) + 1L) + (sorted.lastIndexOf(v) + 1L)
    val grp = rows.groupBy(_._1).view.mapValues(_.map(r => ar2(r._2)))
    val sumR2sq = grp.values
      .map(g => r6(g.sum.toDouble * g.sum / g.size)).sum.toDouble
    val tcorr = rows.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    val hRaw = 3.0 * sumR2sq / (n * (n + 1)).toDouble -
      3.0 * (n + 1).toDouble
    val corr = 1.0 - tcorr.toDouble / (n * n * n - n).toDouble
    val h = hRaw / corr
    val row = WindowOps.kruskalDow(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getBoolean(3)) ===
      ((n, grp.size.toLong, micro(h), micro(h) > 12.592)))
  }

  test("q_window_ljung_box: autocorrelation replay") {
    val xs = dailyRev.map(_._2)
    val n = xs.length.toLong
    val s = xs.sum
    val u = xs.map(x => BigInt(n * x - s))
    val g0 = (0 until xs.length).map(t => u(t) * u(t)).sum
    val q = (1 to 7).foldLeft(0.0) { (acc, k) =>
      val gk = (k until xs.length).map(t => u(t) * u(t - k)).sum
      val rk = gk.toDouble / g0.toDouble
      acc + rk * rk / (n - k).toDouble
    }
    val stat = n.toDouble * (n + 2).toDouble * q
    val row = WindowOps.ljungBox(spark, sf0001).collect().head
    assert((row.getLong(0), row.getDouble(1), row.getBoolean(2)) ===
      ((n, micro(stat), micro(stat) > 14.067)))
  }

  test("q_quality_cliff_delta: brute-force pair count == histogram form") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val xs = docs.filter(_._1 == "src0").map(_._2)
    val ys = docs.filter(_._1 == "src1").map(_._2)
    val nGt = (for (x <- xs; y <- ys if x > y) yield 1L).sum
    val nLt = (for (x <- xs; y <- ys if x < y) yield 1L).sum
    val pairs = xs.length.toDouble * ys.length
    val d = micro((nGt - nLt) / pairs)
    val mag = if (math.abs(d) < 0.147) "negligible"
      else if (math.abs(d) < 0.33) "small"
      else if (math.abs(d) < 0.474) "medium" else "large"
    val row = QualityOps.cliffDelta(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getString(5)) ===
      ((xs.length.toLong, ys.length.toLong, micro(nGt / pairs),
        micro(nLt / pairs), d, mag)))
  }
}
