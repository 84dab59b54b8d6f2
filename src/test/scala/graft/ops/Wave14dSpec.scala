package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 fourth wave: independent Scala replays for the five new
  * operators (Cochran's Q, gains/lift table, Brier–Murphy
  * decomposition, Gini decision stump, local clustering coefficient)
  * — statistics recomputed from the RAW fixture with plain
  * collections; the Brier decomposition additionally pins the exact
  * Murphy identity, and local clustering gets a planted
  * triangle-plus-pendant fixture. */
class Wave14dSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private lazy val ordersRaw: Seq[(Long, String, String, Int, Double)] = {
    import org.apache.spark.sql.functions.month
    graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority",
        month($"o_orderdate"), $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getDouble(4))).toSeq
  }

  private lazy val bins: Map[Long, (Long, Long)] = ordersRaw
    .groupBy(o => math.min(math.floor(o._5 / 6000.0), 99.0).toLong)
    .view.mapValues(g => (g.size.toLong,
      g.count(_._2 == "F").toLong)).toMap

  test("q_ml_cochran_q: per-subject L moments replay") {
    val rows = ordersRaw.map { o =>
      val truth = o._2 == "F"
      Seq((o._5 > 150000.0) == truth,
        Set("1-URGENT", "2-HIGH").contains(o._3) == truth,
        (o._4 <= 6) == truth).map(b => if (b) 1L else 0L)
    }
    val g = rows.transpose.map(_.sum)
    val t = g.sum
    val l2 = rows.map(r => r.sum * r.sum).sum
    val num = g.map(gj => (gj * 3 - t).toDouble * (gj * 3 - t)).sum
    val den = 3 * t - l2
    val q = 2.0 * num / (3.0 * den)
    val row = EvalOps.cochranQ(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getDouble(4), row.getBoolean(5)) ===
      ((ordersRaw.size.toLong, g(0), g(1), g(2), micro(q),
        micro(q) > 5.991)))
  }

  test("q_ml_gains_table: cumulative capture replay") {
    val nn = bins.values.map(_._1).sum
    val pp = bins.values.map(_._2).sum
    val sorted = bins.toSeq.sortBy(-_._1)
    val expected = sorted.scanLeft((0L, 0L, 0L, 0L, 0L)) {
      case ((_, _, _, cn, cp), (b, (n, p))) =>
        (b, n, p, cn + n, cp + p)
    }.drop(1).map { case (b, n, p, cn, cp) =>
      (b, n, p, cn, cp, micro(cn.toDouble / nn), micro(cp.toDouble / pp),
        micro(cp.toDouble * nn / (cn.toDouble * pp)))
    }
    val got = EvalOps.gainsTable(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toSeq
    assert(got === expected)
  }

  test("q_ml_brier_decomposition: replay + exact Murphy identity") {
    val nn = bins.values.map(_._1).sum
    val ss = bins.values.map(_._2).sum
    val ybar = ss.toDouble / nn
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, RoundingMode.HALF_UP)
    var (relS, resS, brierS) = (BigDecimal(0), BigDecimal(0), BigDecimal(0))
    for ((b, (n, s)) <- bins) {
      val fb = b.toDouble / 100.0
      val yb = s.toDouble / n
      relS += r6(n * (fb - yb) * (fb - yb))
      resS += r6(n * (yb - ybar) * (yb - ybar))
      brierS += r6(n * fb * fb - 2.0 * fb * s + s)
    }
    val row = EvalOps.brierDecomposition(spark, sf0001).collect().head
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4)) ===
      ((nn, micro(brierS.toDouble / nn), micro(relS.toDouble / nn),
        micro(resS.toDouble / nn), micro(ybar * (1.0 - ybar)))))
    // Murphy 1973: Brier = REL - RES + UNC, exact for bin-constant
    // forecasts (up to the 6dp per-term rounding both engines share)
    val lhs = (brierS / nn).toDouble
    val rhs = ((relS - resS) / nn).toDouble + ybar * (1.0 - ybar)
    assert(math.abs(lhs - rhs) < 1e-6)
  }

  test("q_ml_best_split: exhaustive stump replay") {
    val nn = bins.values.map(_._1).sum
    val ss = bins.values.map(_._2).sum
    val sorted = bins.toSeq.sortBy(_._1)
    val cum = sorted.scanLeft((0L, 0L, 0L)) {
      case ((_, cn, cs), (b, (n, s))) => (b, cn + n, cs + s)
    }.drop(1)
    val cands = cum.filter(_._2 < nn).map { case (b, nl, sl) =>
      val (nr, sr) = (nn - nl, ss - sl)
      val g = 2.0 * sl * (nl - sl) / (nl.toDouble * nn) +
        2.0 * sr * (nr - sr) / (nr.toDouble * nn)
      (math.floor(g * 1e6).toLong, b, nl, nr)
    }
    val best = cands.minBy(c => (c._1, c._2))
    val gp6 = math.floor(2.0 * ss * (nn - ss) /
      (nn.toDouble * nn) * 1e6).toLong
    val row = MlOps.bestSplit(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getDouble(4), row.getDouble(5),
      row.getDouble(6)) ===
      ((nn, best._2, best._3, best._4, gp6 / 1e6, best._1 / 1e6,
        (gp6 - best._1) / 1e6)))
  }

  test("q_graph_local_clustering: wedge-closure replay") {
    val baskets = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val support = collection.mutable.Map.empty[(Long, Long), Int]
    for (items <- baskets; i <- items.indices; j <- i + 1 until items.size)
      support((items(i), items(j))) =
        support.getOrElse((items(i), items(j)), 0) + 1
    val edgeSet = support.filter(_._2 >= 2).keySet.toSet
    val adj = (edgeSet.toSeq ++ edgeSet.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.toSeq.sortBy(_._1).map { case (v, ns) =>
      val deg = ns.size.toLong
      val pairs = ns.toSeq.sorted
      val tri = (for (i <- pairs.indices; j <- i + 1 until pairs.size
        if edgeSet.contains((pairs(i), pairs(j)))) yield 1).size.toLong
      val c = if (deg >= 2)
        Some(micro(2.0 * tri / (deg.toDouble * (deg - 1)))) else None
      (v, deg, tri, c)
    }
    val got = graft.llm.GraphOps.localClustering(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got === expected)
  }

  test("q_graph_local_clustering: planted triangle-plus-pendant") {
    // clique {1,2,3} plus pendant edge 3-4 (all pairs repeated so
    // support >= 2 keeps them): C_1 = C_2 = 1, C_3 = 1/3, C_4 = NULL
    val dir = java.nio.file.Files.createTempDirectory("graft-lcc").toString
    val rows = for (rep <- 0 to 1; (basket, items) <- Seq(
        (10L + rep, Seq(1L, 2L, 3L)), (20L + rep, Seq(3L, 4L)));
      i <- items) yield (basket, i)
    rows.toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.llm.GraphOps.localClustering(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, Some(1.0)), (2L, 2L, 1L, Some(1.0)),
      (3L, 3L, 1L, Some(0.333333)), (4L, 1L, 0L, None)))
  }
}
