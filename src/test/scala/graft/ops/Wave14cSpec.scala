package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-14 third wave: independent Scala replays for the six new
  * operators — every statistic recomputed from the RAW fixture with
  * plain collections, never through the DataFrame under test; label
  * propagation gets an extra planted two-clique fixture whose
  * community structure is known exactly. */
class Wave14cSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, RoundingMode.HALF_UP) * 100).toLongExact

  // calendar fields come out of Spark's date functions (the Wave13
  // getDate precedent — replays recompute the STATISTICS, not the
  // session-timezone plumbing)
  private lazy val ordersRaw: Seq[(Long, Long, String, Int, Double)] = {
    import org.apache.spark.sql.functions.{month, to_date}
    graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey",
        to_date($"o_orderdate").cast("string"),
        month($"o_orderdate"), $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getDouble(4))).toSeq
  }

  private lazy val dailyRev: Seq[(String, Long)] = ordersRaw
    .groupBy(_._3)
    .view.mapValues(_.map(o => cents(o._5)).sum).toSeq.sortBy(_._1)

  test("q_window_pettitt: full U_t replay from the raw fixture") {
    val xs = dailyRev.map(_._2)
    val n = xs.length
    // direct pair definition, not the V-recursion the engine uses:
    // U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j) — each (i<j) pair
    // contributes sgn to every t in [i, j-1], applied as a
    // difference-array range add (O(n^2), not the naive O(n^3))
    val diff = new Array[Long](n + 1)
    for (i <- 0 until n; j <- i + 1 until n) {
      val s = java.lang.Long.signum(xs(i) - xs(j)).toLong
      diff(i) += s
      diff(j) -= s
    }
    val u = diff.take(n).scanLeft(0L)(_ + _).drop(1).toSeq
    val k = u.map(math.abs).max
    val changeDay = dailyRev(u.indexWhere(v => math.abs(v) == k))._1
    val p = math.min(1.0,
      2.0 * math.exp(-6.0 * k * k / (n.toDouble * n * (n + 1))))
    val row = WindowOps.pettitt(spark, sf0001).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === k)
    assert(row.getDate(2).toString === changeDay)
    assert(row.getDouble(3) === micro(p))
    assert(row.getBoolean(4) === (micro(p) <= 0.05))
  }

  test("q_ml_friedman_test: rank replay over complete months") {
    val seg = graft.Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cell = ordersRaw.filter(o => seg.contains(o._2))
      .groupBy(o => (o._3.substring(0, 7), seg(o._2)))
      .view.mapValues(_.map(o => cents(o._5)).sum).toMap
    val k = cell.keys.map(_._2).toSet.size
    val complete = cell.keys.groupBy(_._1).filter(_._2.size == k).keys.toSeq
    // ar2 = minrank + maxrank over the block's sorted values
    val r2 = collection.mutable.Map.empty[String, Long]
    for (blk <- complete) {
      val vs = cell.filter(_._1._1 == blk).toSeq
      val sorted = vs.map(_._2).sorted
      for (((_, sys), v) <- vs) {
        val minr = sorted.indexOf(v) + 1L
        val maxr = sorted.lastIndexOf(v) + 1L
        r2(sys) = r2.getOrElse(sys, 0L) + minr + maxr
      }
    }
    val n = complete.size.toLong
    val ssq = r2.values.map(v => v * v).sum
    val chi2Raw = 3.0 * ssq / (n * k * (k + 1)).toDouble -
      3.0 * (n * (k + 1)).toDouble
    val row = EvalOps.friedmanTest(spark, sf0001).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === k.toLong)
    assert(row.getDouble(2) === micro(chi2Raw))
    assert(row.getDouble(3) === micro(chi2Raw / (n * (k - 1)).toDouble))
    assert(row.getBoolean(4) === (micro(chi2Raw) > 9.488)) // df=4
  }

  test("q_ml_conformal_interval: split/quantile/coverage replay") {
    val folded = ordersRaw.map(o => (o._1 % 4, o._4, cents(o._5)))
    val model = folded.filter(_._1 <= 1).groupBy(_._2)
      .view.mapValues(g => g.map(_._3).sum / g.size).toMap
    val cal = folded.filter(_._1 == 2)
      .map(o => math.abs(o._3 - model(o._2))).sorted
    val nCal = cal.length.toLong
    val k = math.min((9 * nCal + 18) / 10, nCal)
    val qhat = cal((k - 1).toInt)
    val test = folded.filter(_._1 == 3)
      .map(o => math.abs(o._3 - model(o._2)))
    val cov = test.count(_ <= qhat).toDouble / test.length
    val row = EvalOps.conformalInterval(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getDouble(4)) ===
      ((nCal, test.length.toLong, k, qhat, micro(cov))))
    // the split-conformal marginal guarantee itself, on held-out data:
    // coverage should sit at or above the 90% target minus sampling
    // noise (3 sigma of a Bernoulli(0.9) mean over n_test draws)
    val slack = 3.0 * math.sqrt(0.09 / test.length)
    assert(cov >= 0.9 - slack)
  }

  test("q_quality_krippendorff_alpha: coincidence replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars", $"text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def cls(v: Long, lo: Long, hi: Long): Long =
      if (v < lo) 0L else if (v <= hi) 1L else 2L
    val units = docs.map { case (_, nc, text) =>
      val toks = text.split(" ", -1)
      Seq(cls(nc, 250, 400), cls(toks.length, 45, 75),
        cls(toks.distinct.length, 22, 27))
    }
    val n = units.length.toLong
    val doNum = units.map(_.groupBy(identity).values
      .map(g => g.size.toLong * (3 - g.size)).sum).sum
    val pc = units.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val deNum = pc.values.map(p => p * (3 * n - p)).sum
    val dO = doNum.toDouble / (6.0 * n)
    val dE = deNum.toDouble / (3.0 * n * (3.0 * n - 1.0))
    val alpha = 1.0 - doNum.toDouble * (3.0 * n - 1.0) / (2.0 * deNum)
    val row = QualityOps.krippendorffAlpha(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4)) ===
      ((n, 3L, micro(dO), micro(dE), micro(alpha))))
  }

  test("q_graph_label_propagation: 4-round replay from raw lineitem") {
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
    val expected = lbl.groupBy(_._2)
      .map { case (c, m) => (c, m.size.toLong, m.keys.min) }
      .toSeq.sortBy { case (c, sz, _) => (-sz, c) }
    val got = graft.llm.GraphOps.labelPropagation(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q_graph_label_propagation: planted two-clique fixture") {
    // two 4-cliques bridged by one edge; every basket pair repeats so
    // support >= 2 keeps all edges. LPA must find exactly the cliques
    // (min-label tiebreak labels them by their smallest member).
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(11L, 12L, 13L, 14L)
    val rows = (for (rep <- 0 to 1; (basket, items) <- Seq(
        (100L + rep, cliqueA), (200L + rep, cliqueB),
        (300L + rep, Seq(4L, 11L)))) // the bridge
      yield items.map(i => (basket, i))).flatten
    rows.toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.llm.GraphOps.labelPropagation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 4L, 1L), (11L, 4L, 11L)))
  }

  test("q_text_readability: per-word syllable replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val vowelRun = "[aeiouy]+".r
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val syl = ws.map(w => math.max(vowelRun.findAllIn(w).size, 1L)).sum
      val mono = ws.count(w => vowelRun.findAllIn(w).size <= 1).toLong
      val nw = ws.length.toLong
      (id, nw, syl, mono, micro(syl.toDouble / nw),
        micro(20.0 - 15.0 * mono / nw))
    }
    val got = graft.text.TextOps.readability(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected.toSeq)
  }
}
