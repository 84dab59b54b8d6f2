package graft.llm

import graft.SparkTestBase

/** Integer-scaled PageRank: ranking properties on hand-built graphs and
  * agreement with a driver-side double-precision reference. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def pr(pairs: (Long, Long)*): Map[Long, (Long, Long)] =
    GraphOps.pagerankOf(pairs.toDF("a_id", "b_id"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("pr_scaled"))))
      .toMap

  /** Driver-side double PageRank, same recurrence (3 iters, d=0.85),
    * undirected edges. */
  private def refPr(pairs: Seq[(Long, Long)]): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    var rank = deg.map { case (k, _) => k -> 1.0 }
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = deg.map { case (k, _) => k -> (0.15 + 0.85 * in.getOrElse(k, 0.0)) }
    }
    rank
  }

  test("star center outranks leaves; leaves tie exactly") {
    // 1 is the hub of a 5-leaf star
    val out = pr(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 1L -> 6L)
    assert(out(1L)._1 == 5L)
    val leaves = (2L to 6L).map(out(_)._2)
    assert(leaves.distinct.size == 1) // exact tie — integer arithmetic
    assert(out(1L)._2 > leaves.head)
  }

  test("matches the double-precision recurrence to 1e-9 relative") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, // 4-cycle
      5L -> 6L, // isolated pair
      2L -> 4L) // chord
    val got = pr(pairs: _*)
    val want = refPr(pairs)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (_, s)) =>
      val x = s.toDouble / 1e12
      assert(math.abs(x - want(id)) / want(id) < 1e-9,
        s"node $id: int=$x double=${want(id)}")
    }
  }

  test("disconnected components do not leak rank across each other") {
    // identical structure in two components -> identical ranks
    val out = pr(1L -> 2L, 2L -> 3L, 11L -> 12L, 12L -> 13L)
    assert(out(1L)._2 == out(11L)._2)
    assert(out(2L)._2 == out(12L)._2)
    assert(out(3L)._2 == out(13L)._2)
  }

  test("bit-identical across partition counts (the cluster-determinism claim)") {
    val pairs = (1L to 40L).map(i => i -> (i % 20 + 41L))
    val a = pr(pairs: _*)
    val rep = GraphOps.pagerankOf(
      pairs.toDF("a_id", "b_id").repartition(13))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pr_scaled"))
      .toMap
    assert(a.map { case (k, (_, s)) => k -> s } == rep)
  }

  test("market basket matches a driver-side support/lift recompute") {
    val got = GraphOps.marketBasket(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val rows = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)]
      .collect().distinct
    val nBaskets = rows.map(_._1).distinct.length
    val freq = rows.groupBy(_._2).map { case (i, xs) => i -> xs.length }
    val want = rows.groupBy(_._1).values.toSeq
      .flatMap { basket =>
        val items = basket.map(_._2).distinct.sorted
        for (i <- items.indices; j <- i + 1 until items.length)
          yield (items(i), items(j))
      }
      .groupBy(identity).collect { case ((a, b), xs) if xs.length >= 2 =>
        val lift = BigDecimal(
          xs.length.toDouble * nBaskets / (freq(a).toDouble * freq(b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, xs.length.toLong, lift)
      }.toSet
    assert(got.toSet == want)
    assert(want.nonEmpty, "support>=2 pairs must exist at sf0.001")
  }
}
