package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-13 fourth wave: independent Scala replays (the Wave12/13b/13c
  * convention — statistics recomputed from the RAW fixture with plain
  * collections, never through the DataFrame under test). */
class Wave13dSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  test("q_text_keyness: 2x2 G² replay; direction is real overuse") {
    val rows = graft.Tables.documents(spark, sf0001)
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
    rows.foreach { case (src, text) =>
      text.split(" ", -1).foreach { t =>
        val (a, b) = counts.getOrElse(t, (0L, 0L))
        counts(t) = if (src == "src0") (a + 1, b) else (a, b + 1)
      }
    }
    val n0 = counts.values.map(_._1).sum
    val n1 = counts.values.map(_._2).sum
    val n = n0 + n1
    def term(o: Long, num: Long, den: Long): BigDecimal =
      if (o > 0) o * r6(math.log(num.toDouble / den.toDouble))
      else BigDecimal(0)
    val expected = counts.toSeq.map { case (tok, (a, b)) =>
      val (c, d2) = (n0 - a, n1 - b)
      val g2x2 = term(a, a * n, (a + b) * n0) +
        term(b, b * n, (a + b) * n1) +
        term(c, c * n, (c + d2) * n0) +
        term(d2, d2 * n, (c + d2) * n1)
      (tok, a, b, micro(g2x2.toDouble * 2.0),
        if (a * n1 > b * n0) "src0" else "src1")
    }.sortBy { case (tok, _, _, g2, _) => (-g2, tok) }.take(20)
    val got = graft.SparkEntry.queries("q_text_keyness")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSeq
    assert(got == expected)
    // non-vacuous: both directions appear and G² strictly decreases
    // somewhere (the fixture sources are genuinely contrastive)
    assert(got.map(_._5).distinct.length == 2)
    assert(got.map(_._4).distinct.length > 1)
  }

  test("q_text_burstiness: VMR closed form == direct variance") {
    val rows = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = rows.length.toLong
    val perDoc = scala.collection.mutable.Map[(Long, String), Long]()
    rows.foreach { case (id, text) =>
      text.split(" ", -1).foreach { t =>
        perDoc((id, t)) = perDoc.getOrElse((id, t), 0L) + 1L }
    }
    val byTok = perDoc.groupBy(_._1._2).view.mapValues { m =>
      val cs = m.values.toSeq
      (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
    }.toMap
    val expected = byTok.toSeq.collect { case (tok, (df, s1, s2)) if df >= 50 =>
      (tok, df, s1, micro(s1.toDouble / nDocs),
        micro((nDocs * s2 - s1 * s1).toDouble / (nDocs * s1).toDouble))
    }.sortBy { case (tok, _, _, _, vmr) => (-vmr, tok) }.take(20)
    val got = graft.SparkEntry.queries("q_text_burstiness")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the closed form IS the dense-zeros variance: check one token
    // directly against a materialized per-doc vector
    val (tok, df, s1, _, vmr) = got.head
    val dense = rows.map { case (id, _) => perDoc.getOrElse((id, tok), 0L) }
    assert(dense.count(_ > 0) == df && dense.sum == s1)
    val mean = dense.sum.toDouble / nDocs
    val varPop = dense.map(c => (c - mean) * (c - mean)).sum / nDocs
    assert(math.abs(vmr - varPop / mean) < 1e-6)
    // non-vacuous: burstiness separates tokens
    assert(got.map(_._5).distinct.length > 1)
  }

  test("q_window_spearman: rank replay; ties are real; rho != r") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("c"))
      .groupBy($"day").agg(sum($"c").as("rev"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    def avgRanks2(vs: Seq[Long]): Seq[Long] = {
      // 2-scaled average ranks: 2*minrank + tiecount - 1
      val sorted = vs.sorted
      val first = vs.map(v => sorted.indexOf(v) + 1L)
      val ties = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      vs.indices.map(i => 2 * first(i) + ties(vs(i)) - 1)
    }
    val ax = avgRanks2(daily.map(_._1))
    val ay = avgRanks2(daily.map(_._2))
    def pearson(x: Seq[Long], y: Seq[Long]): Double = {
      val n = x.length.toDouble
      val (sx, sy) = (x.sum.toDouble, y.sum.toDouble)
      val sxy = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      val sxx = x.map(a => a.toDouble * a).sum
      val syy = y.map(a => a.toDouble * a).sum
      micro((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    }
    val row = graft.SparkEntry.queries("q_window_spearman")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == daily.length)
    assert(row.getDouble(1) == pearson(daily.map(_._1), daily.map(_._2)))
    assert(row.getDouble(2) == pearson(ax, ay))
    // the tie machinery is exercised: order counts tie on real days
    assert(daily.map(_._2).distinct.length < daily.length)
    // association is real and positive (more orders, more revenue)
    assert(row.getDouble(2) > 0.5)
  }

  test("q_graph_assortativity: Newman r replay on the basket graph") {
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    items.groupBy(_._1).values.foreach { b =>
      val is = b.map(_._2).distinct.sorted
      for (i <- is.indices; j <- i + 1 until is.length)
        support((is(i), is(j))) = support.getOrElse((is(i), is(j)), 0) + 1
    }
    val edges = support.filter(_._2 >= 2).keySet.toSeq
    val directed = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = directed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m2 = directed.size.toLong
    val sjk = directed.map { case (u, v) => deg(u) * deg(v) }.sum
    val sj = directed.map { case (u, v) => deg(u) + deg(v) }.sum
    val sjj = directed.map { case (u, v) =>
      deg(u) * deg(u) + deg(v) * deg(v) }.sum
    val h = sj / 2
    val r = micro((m2 * sjk - h * h).toDouble /
      (m2 * (sjj / 2) - h * h).toDouble)
    val row = graft.SparkEntry.queries("q_graph_assortativity")(
      spark, sf0001).collect().head
    assert(row.getLong(0) == deg.size && row.getLong(1) == edges.size)
    assert(row.getDouble(2) == r)
    // non-degenerate: |r| < 1 and the graph has degree variance
    assert(math.abs(r) < 1.0 && deg.values.toSeq.distinct.length > 1)
  }
}
