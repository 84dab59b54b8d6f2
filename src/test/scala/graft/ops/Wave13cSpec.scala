package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-13 third wave: independent Scala replays for the five new
  * oracled operators (the Wave12/13b convention — every statistic is
  * recomputed from the RAW fixture with plain collections, never
  * through the DataFrame under test). */
class Wave13cSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  /** (n_chars) samples for src0/src1 */
  private lazy val samples: (Seq[Long], Seq[Long]) = {
    val rows = graft.Tables.documents(spark, sf0001)
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    (rows.filter(_._1 == "src0").map(_._2).toSeq,
      rows.filter(_._1 == "src1").map(_._2).toSeq)
  }

  test("q_quality_mann_whitney: brute-force rank-sum replay") {
    val (xs, ys) = samples
    var ux2 = 0L // 2-scaled: win = 2, tie = 1
    for (x <- xs; y <- ys)
      ux2 += (if (x > y) 2L else if (x == y) 1L else 0L)
    val n0 = xs.length.toLong; val n1 = ys.length.toLong; val n = n0 + n1
    val t3t = (xs ++ ys).groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * t * t - t }).sum
    val variance = (n0 * n1).toDouble / 12.0 *
      ((n + 1).toDouble - t3t.toDouble / (n * (n - 1)).toDouble)
    val row = graft.SparkEntry.queries("q_quality_mann_whitney")(
      spark, sf0001).collect().head
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    assert(row.getDouble(2) == ux2.toDouble / 2.0)
    assert(row.getDouble(3) ==
      micro((ux2 - n0 * n1).toDouble / (2.0 * math.sqrt(variance))))
    assert(row.getDouble(4) == micro((ux2 - n0 * n1).toDouble /
      (n0 * n1).toDouble))
  }

  test("q_quality_js_divergence: direct KL replay; JS in [0, ln 2]") {
    val (xs, ys) = samples
    val n0 = xs.length.toLong; val n1 = ys.length.toLong
    val dom = (xs ++ ys).distinct
    var s0 = BigDecimal(0); var s1 = BigDecimal(0)
    dom.foreach { v =>
      val c0 = xs.count(_ == v).toLong; val c1 = ys.count(_ == v).toLong
      val den = c0 * n1 + c1 * n0
      if (c0 > 0) s0 += c0 * r6(math.log(2.0 * (c0 * n1) / den.toDouble))
      if (c1 > 0) s1 += c1 * r6(math.log(2.0 * (c1 * n0) / den.toDouble))
    }
    val row = graft.SparkEntry.queries("q_quality_js_divergence")(
      spark, sf0001).collect().head
    assert(row.getLong(0) == n0 && row.getLong(1) == n1 &&
      row.getLong(2) == dom.size)
    val kl0 = micro(s0.toDouble / n0)
    val kl1 = micro(s1.toDouble / n1)
    assert(row.getDouble(3) == kl0 && row.getDouble(4) == kl1)
    assert(row.getDouble(5) ==
      micro((s0.toDouble / n0 + s1.toDouble / n1) / 2.0))
    // bounds + non-vacuity: 0 < JS ≤ ln 2, and both one-sided KLs > 0
    assert(row.getDouble(5) > 0.0 && row.getDouble(5) <= math.log(2.0))
    assert(kl0 > 0 && kl1 > 0)
  }

  test("q_ml_cuped: moment replay; adjustment preserves the delta shape") {
    import org.apache.spark.sql.functions._
    val per = graft.Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(
        sum(when($"o_orderdate" < lit("1999-01-01").cast("timestamp"),
          expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)" +
            " div 100")).otherwise(0L)).as("x"),
        sum(when($"o_orderdate" >= lit("1999-01-01").cast("timestamp"),
          expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)" +
            " div 100")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val arms = per.map { case (k, x, y) =>
      val h = Math.floorMod(
        Math.floorMod(k, 1000000007L) * 2654435761L + 13L, 1000L)
      (if (h < 500L) "treat" else "control", x, y)
    }
    val n = arms.length.toDouble
    val sx = arms.map(_._2).sum.toDouble; val sy = arms.map(_._3).sum.toDouble
    val sxy = arms.map(t => t._2 * t._3).sum.toDouble
    val sxx = arms.map(t => t._2 * t._2).sum.toDouble
    val syy = arms.map(t => t._3 * t._3).sum.toDouble
    val cov = sxy / n - (sx / n) * (sy / n)
    val varx = sxx / n - (sx / n) * (sx / n)
    val vary = syy / n - (sy / n) * (sy / n)
    val theta = cov / varx
    val got = graft.SparkEntry.queries("q_ml_cuped")(spark, sf0001)
      .orderBy($"arm").collect()
    Seq("control", "treat").zip(got).foreach { case (arm, row) =>
      val g = arms.filter(_._1 == arm)
      val ax = g.map(_._2).sum.toDouble; val ay = g.map(_._3).sum.toDouble
      assert(row.getString(0) == arm && row.getLong(1) == g.length)
      assert(row.getDouble(2) == micro(ay / g.length))
      assert(row.getDouble(3) ==
        micro(ay / g.length - theta * (ax / g.length - sx / n)))
      assert(row.getDouble(4) == micro(theta))
      assert(row.getDouble(5) == micro(
        1.0 - (vary - 2.0 * theta * cov + theta * theta * varx) / vary))
    }
    // the variance-reduction ratio is a genuine reduction (ρ² > 0)
    assert(got.head.getDouble(5) > 0.0 && got.head.getDouble(5) < 1.0)
  }

  test("q_ml_ate_strata: confounding is real; stratification corrects") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val flagged = docs.map { case (id, lang, y) =>
      val h = Math.floorMod(
        Math.floorMod(id, 1000000007L) * 2654435761L + 29L, 1000L)
      (lang, if (h < (if (lang == "en") 650L else 350L)) 1 else 0, y)
    }
    val byArm = flagged.groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toMap
    val naive = micro(byArm(1)._2.toDouble / byArm(1)._1 -
      byArm(0)._2.toDouble / byArm(0)._1)
    val strata = flagged.groupBy(_._1).map { case (_, g) =>
      val t = g.filter(_._2 == 1); val c = g.filter(_._2 == 0)
      (g.length.toLong, r6(t.map(_._3).sum.toDouble / t.length -
        c.map(_._3).sum.toDouble / c.length))
    }
    val ate = micro(strata.map { case (ns, d) => BigDecimal(ns) * d }
      .sum.toDouble / strata.map(_._1).sum.toDouble)
    val row = graft.SparkEntry.queries("q_ml_ate_strata")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == docs.length && row.getLong(1) == 5)
    assert(row.getLong(2) == 0L) // all 5 fixture strata have both arms
    assert(row.getDouble(3) == naive && row.getDouble(4) == ate)
    // the design's point: propensity is confounded with lang, so the
    // naive difference and the stratified estimate genuinely disagree
    assert(math.abs(naive - ate) > 1e-6)
  }

  test("q_text_textrank: exact weighted-integer replay; ranks vary") {
    // independent replay of the ENTIRE weighted integer recurrence in
    // plain Scala maps — same arithmetic, independent implementation
    val stop = graft.text.Stopwords.tokenSet
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"text").as[String].collect()
    val wmap = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { text =>
      val t = text.split(" ", -1)
      for (i <- t.indices; o <- 1 to 2 if i + o < t.length) {
        val (x, y) = (t(i), t(i + o))
        if (x != y && !stop(x) && !stop(y)) {
          val k = (if (x < y) x else y, if (x < y) y else x)
          wmap(k) = wmap.getOrElse(k, 0L) + 1L
        }
      }
    }
    val out = scala.collection.mutable.Map[String, List[(String, Long)]]()
    wmap.foreach { case ((a, b), w) =>
      out(a) = (b, w) :: out.getOrElse(a, Nil)
      out(b) = (a, w) :: out.getOrElse(b, Nil)
    }
    val wdeg = out.view.mapValues(_.map(_._2).sum).toMap
    val deg = out.view.mapValues(_.size.toLong).toMap
    val share = out.toSeq.flatMap { case (src, ns) =>
      ns.map { case (dst, w) => (src, dst, w * 1000000L / wdeg(src)) } }
    var pr = wdeg.map { case (w, _) => w -> 1000000000000L }
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map[String, Long]()
      share.foreach { case (src, dst, s) =>
        val p = pr(src)
        in(dst) = in.getOrElse(dst, 0L) +
          (p / 1000000L) * s + (p % 1000000L) * s / 1000000L
      }
      pr = wdeg.map { case (w, _) =>
        w -> (150000000000L + 85L * in.getOrElse(w, 0L) / 100L) }
    }
    val expected = pr.toSeq.map { case (w, p) => (w, deg(w), wdeg(w), p) }
      .sortBy { case (w, _, _, p) => (-p, w) }.take(20)
    val got = graft.SparkEntry.queries("q_text_textrank")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // non-vacuous: the weighted walk differentiates (the unweighted
    // graph is COMPLETE on this vocab and would rank constant — the
    // reason the weighted variant is the declared op)
    assert(got.map(_._4).distinct.length > 1)
    assert(wdeg.size > 20)
  }
}
