package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 second wave: independent Scala replays for the five new
  * eval-statistics operators (EvalOps) — every statistic recomputed
  * from the RAW fixture with plain collections, never through the
  * DataFrame under test; the Bradley–Terry MM gets an extra planted
  * 2-player tournament whose fixed point is exact. */
class Wave14bSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  test("q_ml_bradley_terry: planted 2-player tournament hits the exact MM fixed point") {
    // supplier 10 beats 20 in 3 of 4 shared orders: the 2-player MM
    // fixed point is p = (W_a, W_b)·(p_a+p_b)/n with p_a+p_b invariant,
    // reached exactly at round 1 → mean-normalized ratings (1.5, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft-bt").toString
    Seq(
      (1L, 10L, 300.0), (1L, 20L, 100.0),
      (2L, 10L, 300.0), (2L, 20L, 100.0),
      (3L, 10L, 300.0), (3L, 20L, 100.0),
      (4L, 10L, 100.0), (4L, 20L, 300.0)
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = EvalOps.bradleyTerry(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq((10L, 3L, 4L, 1.5), (20L, 1L, 4L, 0.5)))
  }

  test("q_ml_bradley_terry: full MM replay on the fixture") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), cents(r.getDouble(2))))
    val per = li.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byOrder = per.keys.groupBy(_._1)
    var pairs = Map.empty[(Long, Long), (Long, Long, Long)] // wij, wji, n
    for ((ok, ss) <- byOrder; a <- ss; b <- ss
         if a._2 < b._2 && per(a) != per(b)) {
      val _ = ok
      val k = (a._2, b._2)
      val (wij, wji, n) = pairs.getOrElse(k, (0L, 0L, 0L))
      pairs += k -> (if (per(a) > per(b)) (wij + 1, wji, n + 1)
                     else (wij, wji + 1, n + 1))
    }
    val wins = collection.mutable.Map.empty[Long, (Long, Long)]
    for (((i, j), (wij, wji, n)) <- pairs) {
      val (wi, ni) = wins.getOrElse(i, (0L, 0L))
      wins(i) = (wi + wij, ni + n)
      val (wj, nj) = wins.getOrElse(j, (0L, 0L))
      wins(j) = (wj + wji, nj + n)
    }
    var p = wins.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 6) { // the r16 budget: 6 MM rounds, curve shipped
      val den = collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (((i, j), (_, _, n)) <- pairs) {
        den(i) += n / (p(i) + p(j)); den(j) += n / (p(i) + p(j))
      }
      p = wins.map { case (s, (w, _)) => s -> w / den(s) }.toMap
    }
    val pbar = p.values.sum / p.size
    val spark14 = EvalOps.bradleyTerry(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(spark14.keySet === wins.keySet)
    for ((s, (w, n)) <- wins) {
      val (sw, sn, rating) = spark14(s)
      assert(sw == w && sn == n, s"supplier $s wins/comparisons")
      // sum-order ulp across partitionings: allow one micro quantum
      assert(math.abs(rating - micro(p(s) / pbar)) <= 1e-6 + 1e-12,
        s"supplier $s rating $rating vs ${micro(p(s) / pbar)}")
    }
  }

  test("q_ml_pass_at_k: exact falling-factorial replay") {
    val per = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey", $"o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.count(_._2 == "F").toLong)).toMap
    def passAt(k: Int): (Long, Double) = {
      val el = per.values.filter(_._1 >= k).toSeq
      val vals = el.map { case (n, c) =>
        val numer = math.max((0 until k).map(j => n - c - j).product, 0L)
        val denom = (0 until k).map(j => n - j).product
        1.0 - numer.toDouble / denom.toDouble
      }
      (el.size.toLong, vals.sum / vals.size)
    }
    val rows = EvalOps.passAtK(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for (k <- Seq(1, 3, 5)) {
      val (np, pk) = passAt(k)
      assert(rows(k)._1 == np, s"k=$k problems")
      assert(math.abs(rows(k)._2 - micro(pk)) <= 1e-6 + 1e-12, s"k=$k")
    }
    // more attempts can only help: pass@1 <= pass@3 <= pass@5
    assert(rows(1)._2 <= rows(3)._2 && rows(3)._2 <= rows(5)._2)
  }

  test("q_ml_mcnemar: exact disagreement-cell replay") {
    val o = graft.Tables.orders(spark, sf0001)
      .select($"o_totalprice", $"o_orderpriority", $"o_orderstatus")
      .collect()
    val cells = o.map { r =>
      val truth = r.getString(2) == "F"
      val okA = (r.getDouble(0) > 150000.0) == truth
      val okB = Set("1-URGENT", "2-HIGH").contains(r.getString(1)) == truth
      (okA, okB)
    }
    val na = cells.count(_._1).toLong
    val nb = cells.count(_._2).toLong
    val b = cells.count(c => c._1 && !c._2).toLong
    val c = cells.count(c => !c._1 && c._2).toLong
    val row = EvalOps.mcnemar(spark, sf0001).collect().head
    assert(row.getLong(0) == o.length.toLong)
    assert(row.getLong(1) == b && row.getLong(2) == c)
    assert(row.getDouble(3) == micro(na.toDouble / o.length))
    assert(row.getDouble(4) == micro(nb.toDouble / o.length))
    val d = math.max(math.abs(b - c) - 1, 0L)
    assert(row.getDouble(5) == micro((d * d).toDouble / (b + c).toDouble))
    // the disagreement cells are non-empty on the fixture
    assert(b + c > 0)
  }

  test("q_ml_fdr_bh: exact step-up replay; rejections real at sf0.001") {
    val counts = graft.Tables.documents(spark, sf0001)
      .select($"text").collect().iterator
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val m = counts.size.toLong
    val tn = counts.values.sum
    val scored = counts.toSeq.map { case (tk, n) =>
      val z = (n - tn.toDouble / m) /
        math.sqrt(tn.toDouble / m * (1.0 - 1.0 / m))
      (tk, n, micro(z), micro(math.exp(-z * z / 2)))
    }
    val ranked = scored.sortBy(t => (t._4, t._1)).zipWithIndex
      .map { case ((tk, n, z6, p6), i) =>
        (tk, n, z6, p6, i + 1L, micro(0.05 * (i + 1) / m)) }
    val stepUp = ranked.filter(t => t._4 <= t._6).map(_._5)
      .reduceOption(_ max _).getOrElse(0L)
    val expect = ranked.map(t =>
      t._1 -> (t._2, t._3, t._4, t._5, t._6, t._5 <= stepUp)).toMap
    val rows = EvalOps.fdrBh(spark, sf0001).collect()
    assert(rows.length.toLong == m)
    rows.foreach { r =>
      val e = expect(r.getString(0))
      assert(r.getLong(1) == e._1 && r.getDouble(2) == e._2 &&
        r.getDouble(3) == e._3 && r.getLong(4) == e._4 &&
        r.getDouble(5) == e._5 && r.getBoolean(6) == e._6, r.toString)
    }
    // non-vacuous: the step-up boundary splits the family
    val rej = rows.count(_.getBoolean(6))
    assert(rej > 0 && rej < m, s"rejections $rej of $m")
  }

  test("q_ml_isotonic_calibration: brute-force minimax replay; fit is monotone and pooling") {
    val bins = graft.Tables.orders(spark, sf0001)
      .select($"o_totalprice", $"o_orderstatus").collect()
      .map(r => (math.min(math.floor(r.getDouble(0) / 6000.0), 99.0).toLong,
        if (r.getString(1) == "F") 1L else 0L))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, v) => (b, v.size.toLong, v.map(_._2).sum) }
    val n = bins.map(_._2); val s = bins.map(_._3)
    val bIdx = bins.indices
    def mean(j: Int, k: Int): Double =
      (j to k).map(s).sum.toDouble / (j to k).map(n).sum.toDouble
    val iso = bIdx.map { i =>
      (0 to i).map { j => (i until bins.size).map(k => mean(j, k)).min }.max
    }
    val rows = EvalOps.isotonicCalibration(spark, sf0001).collect()
    assert(rows.length == bins.size)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == bins(i)._1 && r.getLong(1) == bins(i)._2)
      assert(r.getDouble(2) == micro(s(i).toDouble / n(i)))
      assert(r.getDouble(3) == micro(iso(i)), s"bin ${bins(i)._1}")
    }
    // isotonic: non-decreasing, and it actually pools somewhere
    val fit = rows.map(_.getDouble(3))
    assert(fit.zip(fit.tail).forall { case (a, b) => a <= b })
    assert(rows.exists(r => r.getDouble(2) != r.getDouble(3)),
      "fit equals raw rates everywhere — pooling not exercised")
  }
}
