package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 fifth wave: independent Scala replays for ECE/MCE, TOST
  * equivalence, the cross-correlation function, the Wald–Wolfowitz
  * runs test, and Newman modularity of the LPA partition — plus a
  * planted two-clique modularity fixture with a hand-computed Q. */
class Wave14eSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  private lazy val ordersRaw: Seq[(String, String, Double)] = {
    import org.apache.spark.sql.functions.to_date
    graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").cast("string"), $"o_orderstatus",
        $"o_totalprice")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
  }

  test("q_ml_expected_calibration_error: binned gap replay") {
    val bins = ordersRaw
      .groupBy(o => math.min(math.floor(o._3 / 6000.0), 99.0).toLong)
      .view.mapValues(g => (g.size.toLong,
        g.count(_._2 == "F").toLong)).toMap
    val nn = bins.values.map(_._1).sum
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    var eceS = BigDecimal(0)
    var mce = 0.0
    for ((b, (n, s)) <- bins) {
      val gap = math.abs(s.toDouble / n - b.toDouble / 100.0)
      eceS += r6(n.toDouble * gap)
      mce = math.max(mce, r6(gap).toDouble)
    }
    val row = EvalOps.expectedCalibrationError(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3)) ===
      ((nn, bins.size.toLong, micro(eceS.toDouble / nn), micro(mce))))
  }

  test("q_quality_tost_equivalence: moment replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def mom(src: String): (Long, Long, Long) = {
      val xs = docs.filter(_._1 == src).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n0, sx0, sxx0) = mom("src0")
    val (n1, sx1, sxx1) = mom("src1")
    val diff = sx0.toDouble / n0 - sx1.toDouble / n1
    val v0 = (sxx0.toDouble - sx0.toDouble * sx0.toDouble / n0) / (n0 - 1)
    val v1 = (sxx1.toDouble - sx1.toDouble * sx1.toDouble / n1) / (n1 - 1)
    val se = math.sqrt(v0 / n0 + v1 / n1)
    val (tl, th) = ((diff + 15.0) / se, (diff - 15.0) / se)
    val row = QualityOps.tostEquivalence(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5),
      row.getBoolean(6)) ===
      ((n0, n1, micro(diff), micro(se), micro(tl), micro(th),
        micro(tl) > 1.645 && micro(th) < -1.645)))
  }

  test("q_window_ccf: calendar-aligned moment replay") {
    val daily = ordersRaw.groupBy(_._1).view
      .mapValues(g => (g.map(o => cents(o._3)).sum, g.size.toLong))
      .toSeq.map { case (d, (rev, cnt)) =>
        (java.time.LocalDate.parse(d), rev, cnt) }
    val byDay = daily.map(d => d._1 -> (d._2, d._3)).toMap
    val expected = (0 to 7).map { l =>
      val pairs = daily.flatMap { case (d1, x, _) =>
        byDay.get(d1.minusDays(l.toLong)).map { case (_, y) => (x, y) }
      }
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val r = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
      (l.toLong, n, micro(r))
    }
    val got = WindowOps.ccf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    // lag-0 revenue/count correlation must be strongly positive
    assert(got.head._3 > 0.5)
  }

  test("q_window_runs_test: sign-sequence replay") {
    val daily = ordersRaw.groupBy(_._1).view
      .mapValues(_.map(o => cents(o._3)).sum).toSeq.sortBy(_._1)
    val n = daily.length
    val med = daily.map(_._2).sorted.apply((n + 1) / 2 - 1) // lower
    val signs = daily.filter(_._2 != med).map(d => d._2 > med)
    val r = 1L + signs.sliding(2).count(p => p(0) != p(1))
    val n1 = signs.count(identity).toLong
    val n2 = signs.size - n1
    val mu = 2.0 * (n1 * n2) / (n1 + n2) + 1.0
    val v = 2.0 * (n1 * n2) * (2 * n1 * n2 - n1 - n2) /
      (((n1 + n2) * (n1 + n2)).toDouble * (n1 + n2 - 1))
    val z = (r.toDouble - mu) / math.sqrt(v)
    val row = WindowOps.runsTest(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3), row.getDouble(4), row.getBoolean(5)) ===
      ((n1, n2, r, micro(mu), micro(z), math.abs(micro(z)) > 1.96)))
  }

  test("q_graph_modularity: integer-identity replay over LPA labels") {
    // rebuild edges + 4 LPA rounds from raw lineitem (the Wave14cSpec
    // replay), then score Q via Q·4m² = Σ(4m·e_c − d_c²)
    val baskets = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val support = collection.mutable.Map.empty[(Long, Long), Int]
    for (items <- baskets; i <- items.indices; j <- i + 1 until items.size)
      support((items(i), items(j))) =
        support.getOrElse((items(i), items(j)), 0) + 1
    val edges = support.filter(_._2 >= 2).keys.toSeq
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lbl = adj.map { case (v, ns) =>
        val votes = (ns.map(lbl) :+ lbl(v)).groupBy(identity)
          .view.mapValues(_.size).toSeq
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = edges.size.toLong
    val dC = adj.toSeq.groupBy(kv => lbl(kv._1))
      .view.mapValues(_.map(_._2.size.toLong).sum).toMap
    val eC = edges.groupBy(e => lbl(e._1))
      .view.mapValues(_.count(e => lbl(e._1) == lbl(e._2)).toLong).toMap
    val num = dC.map { case (c, d) =>
      4L * m * eC.getOrElse(c, 0L) - d * d }.sum
    val q = num.toDouble / (4.0 * m * m)
    val row = graft.llm.GraphOps.modularity(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2)) ===
      ((dC.size.toLong, m, micro(q))))
  }

  test("q_graph_modularity: planted two-clique fixture, hand-computed Q") {
    // two 4-cliques + one bridge: m=13, each community has e_c=6 and
    // d_c=13 (12 intra-degrees + the bridge endpoint), so
    // Q = 2·(4·13·6 − 169)/676 = 286/676 = 0.423076…
    val dir = java.nio.file.Files.createTempDirectory("graft-mod").toString
    val rows = for (rep <- 0 to 1; (basket, items) <- Seq(
        (100L + rep, Seq(1L, 2L, 3L, 4L)),
        (200L + rep, Seq(11L, 12L, 13L, 14L)),
        (300L + rep, Seq(4L, 11L)));
      i <- items) yield (basket, i)
    rows.toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val row = graft.llm.GraphOps.modularity(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2)) ===
      ((2L, 13L, 0.423076)))
  }
}
