package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 sixth wave: independent Scala replays for Burrows's
  * Delta, Youden's J, Hedges' g, quadratic-weighted kappa, and the
  * rescaled-range Hurst exponent — all recomputed from raw fixtures
  * with plain collections. */
class Wave14fSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  test("q_text_burrows_delta: dense z-score replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sw = docs.flatMap { case (s, t) =>
      t.split(" ").filter(_.nonEmpty).map(w => (s, w)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sources = docs.map(_._1).distinct.sorted
    val vocab = sw.keys.map(_._2).toSeq.distinct.sorted
    val tot = sources.map(s =>
      s -> sw.collect { case ((`s`, _), c) => c }.sum).toMap
    val f6 = (for (s <- sources; w <- vocab)
      yield (s, w) -> sw.getOrElse((s, w), 0L) * 1000000L / tot(s)).toMap
    val n = sources.length.toLong
    val keep = vocab.flatMap { w =>
      val vals = sources.map(s => f6((s, w)))
      val (sm, q) = (vals.sum, vals.map(v => v * v).sum)
      val varn = n * q - sm * sm
      if (varn > 0) Some(w -> varn) else None
    }.toMap
    val expected = (for {
      i <- sources.indices; j <- i + 1 until sources.length
    } yield {
      val (a, b) = (sources(i), sources(j))
      val terms = keep.toSeq.map { case (w, varn) =>
        r6(n.toDouble * math.abs(f6((a, w)) - f6((b, w))).toDouble /
          math.sqrt(varn.toDouble))
      }
      (a, b, keep.size.toLong,
        micro(terms.sum.toDouble / keep.size))
    }).sortBy(p => (p._1, p._2))
    val got = graft.text.TextOps.burrowsDelta(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
  }

  private lazy val binsFixture: Map[Long, (Long, Long)] = {
    graft.Tables.orders(spark, sf0001)
      .select($"o_totalprice", $"o_orderstatus").collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSeq
      .groupBy(o => math.min(math.floor(o._1 / 6000.0), 99.0).toLong)
      .view.mapValues(g => (g.size.toLong,
        g.count(_._2 == "F").toLong)).toMap
  }

  test("q_ml_youden_j: ROC sweep replay") {
    val nn = binsFixture.values.map(_._1).sum
    val pp = binsFixture.values.map(_._2).sum
    val sorted = binsFixture.toSeq.sortBy(-_._1)
    val cands = sorted.scanLeft((0L, 0L, 0L)) {
      case ((_, tp, pr), (b, (cn, cp))) => (b, tp + cp, pr + cn)
    }.drop(1).map { case (b, tp, predpos) =>
      val fp = predpos - tp
      val (tpr, fpr) = (tp.toDouble / pp, fp.toDouble / (nn - pp))
      (math.floor((tpr - fpr) * 1e6).toLong, b, tp, fp, tpr, fpr)
    }
    val best = cands.minBy(c => (-c._1, c._2))
    val row = EvalOps.youdenJ(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4), row.getDouble(5),
      row.getDouble(6), row.getDouble(7)) ===
      ((best._2, best._3, best._4, pp - best._3,
        nn - pp - best._4, micro(best._5), micro(best._6),
        best._1 / 1e6)))
  }

  test("q_quality_hedges_g: pooled-SD replay") {
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
    val sp = math.sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) /
      (n0 + n1 - 2).toDouble)
    val d = diff / sp
    val corr = 1.0 - 3.0 / (4 * (n0 + n1) - 9).toDouble
    val row = QualityOps.hedgesG(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5)) ===
      ((n0, n1, micro(diff), micro(sp), micro(d), micro(d * corr))))
  }

  test("q_quality_weighted_kappa: confusion replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"n_chars", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def cls(v: Long, lo: Long, hi: Long): Long =
      if (v < lo) 0L else if (v <= hi) 1L else 2L
    val pairs = docs.map { case (nc, t) =>
      (cls(nc, 250, 400), cls(t.split(" ", -1).length.toLong, 45, 75)) }
    val n = pairs.length.toLong
    val cells = pairs.groupBy(identity).view.mapValues(_.size.toLong)
    val wo = cells.map { case ((i, j), o) => (i - j) * (i - j) * o }.sum
    val ri = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cj = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val we = (for (i <- ri.keys; j <- cj.keys)
      yield BigInt((i - j) * (i - j) * ri(i)) * cj(j)).sum
    val kw = 1.0 - n.toDouble * wo.toDouble / we.toDouble
    val row = QualityOps.weightedKappa(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2)) ===
      ((n, wo, micro(kw))))
  }

  test("q_window_hurst: R/S replay + sanity range") {
    import org.apache.spark.sql.functions.to_date
    val daily = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").cast("string"), $"o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(o => cents(o._2)).sum)
      .toSeq.sortBy(_._1).map(_._2).toArray
    val sizes = Seq(16L, 32L, 64L, 128L)
    val bySize = sizes.map { s =>
      val nb = daily.length / s.toInt
      val rss = (0 until nb).flatMap { b =>
        val xs = daily.slice(b * s.toInt, (b + 1) * s.toInt)
        val tot = xs.sum
        val ssq = xs.map(x => BigInt(x) * x).sum
        val mu = tot.toDouble / s.toDouble
        var cum = 0L
        val devs = xs.zipWithIndex.map { case (x, t) =>
          cum += x
          cum.toDouble - (t + 1).toDouble * mu
        }
        val r = devs.max - devs.min
        val sd = math.sqrt(ssq.toDouble / s.toDouble - mu * mu)
        if (sd > 0.0) Some(r6(r / sd)) else None
      }
      (s, rss.size.toLong, rss.sum.toDouble / rss.size)
    }
    val pts = bySize.map { case (s, _, m) =>
      (r6(math.log(s.toDouble)), r6(math.log(m)),
        r6(math.log(s.toDouble) * math.log(m)),
        r6(math.log(s.toDouble) * math.log(s.toDouble)))
    }
    val k = pts.length.toDouble
    val (sx, sy, sxy, sxx) = (pts.map(_._1).sum.toDouble,
      pts.map(_._2).sum.toDouble, pts.map(_._3).sum.toDouble,
      pts.map(_._4).sum.toDouble)
    val h = micro((k * sxy - sx * sy) / (k * sxx - sx * sx))
    val expected = bySize.map { case (s, nb, m) =>
      (s, nb, micro(m), h) }
    val got = WindowOps.hurst(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // aggregated i.i.d.-ish daily sums should sit in the open (0,1)
    // band; the exact value is data-dependent but H must be sane
    assert(h > 0.0 && h < 1.0)
  }
}
