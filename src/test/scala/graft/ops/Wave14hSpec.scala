package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 eighth wave: independent Scala replays for the
  * Lo–MacKinlay variance ratio and the LPA round-2-vs-round-4
  * Adjusted Rand Index. */
class Wave14hSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  test("q_window_variance_ratio: overlapping-sum replay") {
    import org.apache.spark.sql.functions.to_date
    val xs = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").cast("string"), $"o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(o => cents(o._2)).sum)
      .toSeq.sortBy(_._1).map(_._2)
    def popVarN3(vals: Seq[Long]): Double = {
      val n = vals.length.toLong
      val s = vals.sum
      val uu = vals.map(x => BigInt(n * x - s)).map(u => u * u).sum
      uu.toDouble / (n.toDouble * n * n)
    }
    val v1 = popVarN3(xs)
    val expected = Seq(2, 5, 10).map { q =>
      val sums = xs.sliding(q).map(_.sum).toSeq
      (q.toLong, sums.length.toLong,
        micro(popVarN3(sums) / (q * v1)))
    }
    val got = WindowOps.varianceRatio(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("q_graph_lpa_stability: ARI replay from raw lineitem") {
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
    var lbl2 = lbl
    for (r <- 1 to 4) {
      lbl = adj.map { case (v, ns) =>
        val votes = (ns.map(lbl) :+ lbl(v)).groupBy(identity)
          .view.mapValues(_.size).toSeq
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }
      if (r == 2) lbl2 = lbl
    }
    def c2(x: Long): Long = x * (x - 1) / 2
    val pairs = adj.keys.toSeq.map(v => (lbl2(v), lbl(v)))
    val n = pairs.length.toLong
    val sumNij2 = pairs.groupBy(identity).values
      .map(g => c2(g.size.toLong)).sum
    val a = pairs.groupBy(_._1).values.map(g => c2(g.size.toLong))
    val b = pairs.groupBy(_._2).values.map(g => c2(g.size.toLong))
    val expected2 = (BigInt(a.sum) * b.sum).toDouble / c2(n)
    val maxi = (a.sum + b.sum).toDouble / 2.0
    val ari = (sumNij2.toDouble - expected2) / (maxi - expected2)
    val row = graft.llm.GraphOps.lpaStability(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3)) ===
      ((n, pairs.map(_._1).distinct.size.toLong,
        pairs.map(_._2).distinct.size.toLong, micro(ari))))
    // round 4 should have (weakly) consolidated the partition
    assert(row.getLong(2) <= row.getLong(1))
  }
}
