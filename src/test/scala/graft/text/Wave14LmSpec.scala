package graft.text

import graft.SparkTestBase

/** Round-14 LM-statistics wave: independent Scala replays for the
  * trigram-space estimators (LmOps) — counts recomputed from the raw
  * fixture with plain collections, plus the structural invariants that
  * make each estimator trustworthy (GT mass bookkeeping, Chao1 ≥ V,
  * the exact KN sum-to-one identity). */
class Wave14LmSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private lazy val docs: Seq[(String, Array[String])] =
    graft.Tables.documents(spark, sf0001)
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1))).toSeq

  private def trigrams(t: Array[String]): Seq[String] =
    if (t.length < 3) Seq.empty
    else (0 until t.length - 2).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")

  private lazy val counts: Map[String, Long] =
    docs.flatMap(d => trigrams(d._2)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap

  test("q_text_good_turing: freq-of-freqs replay; GT mass bookkeeping") {
    val fof = counts.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val tn = counts.values.sum
    val rows = LmOps.goodTuring(spark, sf0001).collect()
    assert(rows.length == 11)
    rows.foreach { row =>
      val r = row.getLong(0)
      val nr = fof.getOrElse(r, 0L)
      val nrNext = fof.getOrElse(r + 1, 0L)
      assert(row.getLong(1) == nr, s"r=$r n_types")
      if (r >= 1 && nr > 0 && nrNext > 0)
        assert(row.getDouble(2) ==
          micro((r + 1) * nrNext.toDouble / nr.toDouble), s"r=$r r_star")
      else assert(row.isNullAt(2), s"r=$r r_star should be NULL")
      val expMass =
        if (r == 0) micro(fof.getOrElse(1L, 0L).toDouble / tn)
        else micro(nr.toDouble * r / tn)
      assert(row.getDouble(3) == expMass, s"r=$r p_mass")
    }
    // GT discounts below r for the sparse tail (r* < r at small r on a
    // singleton-heavy fixture), and the unseen mass is real
    val p0 = rows.find(_.getLong(0) == 0L).get.getDouble(3)
    assert(p0 > 0.0 && p0 < 1.0)
    val r1star = rows.find(_.getLong(0) == 1L).get.getDouble(2)
    assert(r1star > 0.0 && r1star < 1.5, s"r*(1)=$r1star")
  }

  test("q_text_chao1: per-lang replay; chao1 >= V, coverage in (0,1)") {
    val byLang = docs.groupBy(_._1).view.mapValues { ds =>
      val c = ds.flatMap(d => trigrams(d._2)).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val v = c.size.toLong; val n = c.values.sum
      val f1 = c.values.count(_ == 1L).toLong
      val f2 = c.values.count(_ == 2L).toLong
      (n, v, f1, f2)
    }.toMap
    val rows = LmOps.chao1(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq == byLang.keys.toSeq.sorted)
    rows.foreach { row =>
      val (n, v, f1, f2) = byLang(row.getString(0))
      assert(row.getLong(1) == n && row.getLong(2) == v &&
        row.getLong(3) == f1 && row.getLong(4) == f2)
      assert(row.getDouble(5) ==
        micro(v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))))
      assert(row.getDouble(6) == micro(1.0 - f1.toDouble / n))
      // richness lower bound at least the observed vocabulary; a
      // singleton-heavy corpus is far from fully covered
      assert(row.getDouble(5) >= v.toDouble)
      assert(row.getDouble(6) > 0.0 && row.getDouble(6) < 1.0)
    }
  }

  test("q_text_kneser_ney: top-20 replay; exact sum-to-one identity") {
    val c3 = counts.map { case (g, n) =>
      val i = g.lastIndexOf(' ')
      ((g.substring(0, i), g.substring(i + 1)), n)
    }
    val byCtx = c3.groupBy(_._1._1).view.mapValues(m =>
      (m.values.sum, m.size.toLong)).toMap
    val byW3 = c3.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = c3.size.toLong
    val d = 0.75
    def pkn(ctx: String, w3: String, c123: Long): Double = {
      val (c12, n1pCtx) = byCtx(ctx)
      math.max(c123 - d, 0.0) / c12 +
        d * n1pCtx.toDouble / c12 * (byW3(w3).toDouble / b)
    }
    val expTop = c3.toSeq.map { case ((ctx, w3), n) => (ctx, w3, n) }
      .sortBy(t => (-t._3, t._1, t._2)).take(20)
    val rows = LmOps.kneserNey(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.zip(expTop).foreach { case (row, (ctx, w3, c123)) =>
      assert(row.getString(0) == ctx && row.getString(1) == w3 &&
        row.getLong(2) == c123, row.toString)
      assert(row.getLong(3) == byCtx(ctx)._1 &&
        row.getLong(4) == byCtx(ctx)._2 && row.getLong(5) == byW3(w3))
      assert(row.getDouble(6) == micro(byW3(w3).toDouble / b))
      assert(row.getDouble(7) == micro(pkn(ctx, w3, c123)), s"$ctx|$w3")
    }
    // Σ_{w3 ∈ vocab} P_KN(w3|ctx) = 1 EXACTLY: observed mass leaves
    // d·N1+(ctx)/c12, and the continuation distribution sums to 1
    val ctx = expTop.head._1
    val obs = c3.collect { case ((c, w), n) if c == ctx => pkn(c, w, n) }.sum
    val obsW3 = c3.keys.collect { case (c, w) if c == ctx => w }.toSet
    val (c12, n1pCtx) = byCtx(ctx)
    val unseen = byW3.filterNot(kv => obsW3.contains(kv._1)).values
      .map(n1pW3 => d * n1pCtx.toDouble / c12 * (n1pW3.toDouble / b)).sum
    assert(math.abs(obs + unseen - 1.0) < 1e-9,
      s"KN mass for '$ctx' = ${obs + unseen}")
  }
}
