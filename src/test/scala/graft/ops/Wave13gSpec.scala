package graft.ops

import graft.SparkTestBase

/** Round-13 seventh wave: independent replays (established convention). */
class Wave13gSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  test("q_graph_kcore: peel-to-FIXPOINT replay equals the 8-round engine") {
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    items.groupBy(_._1).values.foreach { b =>
      val is = b.map(_._2).distinct.sorted
      for (i <- is.indices; j <- i + 1 until is.length)
        support((is(i), is(j))) = support.getOrElse((is(i), is(j)), 0) + 1
    }
    var edges = support.filter(_._2 >= 2).keySet
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    // peel to FIXPOINT — not a fixed round count: equality with the
    // 8-round engine output proves the engine's round budget reaches
    // the true 2-core on this fixture
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter { case (u, v) => keep(u) && keep(v) }
      changed = next.size != edges.size
      edges = next
    }
    val expected = edges.groupBy(_._1).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_graph_kcore")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // 2-core structural invariant: every survivor keeps degree ≥ 2
    // INSIDE the surviving subgraph
    assert(got.forall(_._2 >= 2))
  }

  test("q_ml_propensity_balance: moment replay; randomization balances") {
    import org.apache.spark.sql.functions._
    val per = graft.Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(
        sum(when($"o_orderdate" < lit("1999-01-01").cast("timestamp"),
          expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)" +
            " div 100")).otherwise(0L)).as("pre_dollars"),
        sum(when($"o_orderdate" < lit("1999-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("pre_orders"),
        countDistinct(when($"o_orderdate" <
          lit("1999-01-01").cast("timestamp"),
          to_date($"o_orderdate"))).as("pre_days"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def arm(k: Long): Int =
      if (Math.floorMod(Math.floorMod(k, 1000000007L) * 2654435761L + 13L,
        1000L) < 500L) 1 else 0
    val covs = Seq(
      ("pre_days", per.map(p => (arm(p._1), p._4))),
      ("pre_dollars", per.map(p => (arm(p._1), p._2))),
      ("pre_orders", per.map(p => (arm(p._1), p._3))))
    val got = graft.SparkEntry.queries("q_ml_propensity_balance")(
      spark, sf0001).orderBy($"covariate").collect()
    covs.zip(got).foreach { case ((name, vs), row) =>
      val t = vs.filter(_._1 == 1).map(_._2)
      val c = vs.filter(_._1 == 0).map(_._2)
      def stats(xs: Seq[Long]): (Double, Double) = {
        val n = xs.length.toLong
        val s = xs.sum
        val q = xs.map(x => BigInt(x) * BigInt(x)).sum
        (s.toDouble / n,
          (BigInt(n) * q - BigInt(s) * BigInt(s)).toDouble /
            (n * (n - 1)).toDouble)
      }
      val (m1, v1) = stats(t); val (m0, v0) = stats(c)
      assert(row.getString(0) == name)
      assert(row.getLong(1) == t.length && row.getLong(2) == c.length)
      assert(row.getDouble(3) == micro(m1) && row.getDouble(4) == micro(m0))
      val smd = micro((m1 - m0) / math.sqrt((v1 + v0) / 2.0))
      assert(row.getDouble(5) == smd, s"$name")
      // the hash split is genuinely randomized: balanced by the
      // conventional |SMD| < 0.1 bar, but not identically zero
      assert(math.abs(smd) < 0.1 && smd != 0.0, s"$name smd=$smd")
    }
  }
}
