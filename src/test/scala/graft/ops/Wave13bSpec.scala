package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-13 second wave: independent Scala replays + topology pins for
  * the seven new oracled operators (the Wave12Spec convention). Every
  * replay recomputes the statistic from the RAW fixture with plain
  * Scala collections — never through the DataFrame under test. */
class Wave13bSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  /** daily revenue in integer cents, day-ascending */
  private lazy val daily: Seq[Long] = {
    import org.apache.spark.sql.functions._
    graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("c"))
      .groupBy($"day").agg(sum($"c").as("rev"))
      .orderBy($"day").collect().map(_.getLong(1)).toSeq
  }

  test("q_window_mann_kendall: textbook pairwise replay") {
    val n = daily.length
    var s = 0L
    for (i <- daily.indices; j <- i + 1 until n)
      s += java.lang.Long.signum(daily(j) - daily(i))
    val ties = daily.groupBy(identity).values.map(_.size.toLong)
    val ux2 = ties.map(t => t * (t - 1)).sum
    val tcorr = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val nl = n.toLong
    val var18 = nl * (nl - 1) * (2 * nl + 5) - tcorr
    val d0x2 = nl * (nl - 1)
    val tau = micro(s.toDouble /
      math.sqrt((d0x2.toDouble / 2.0) * ((d0x2 - ux2).toDouble / 2.0)))
    val z =
      if (s > 0) micro((s - 1).toDouble / math.sqrt(var18.toDouble / 18.0))
      else if (s < 0) micro((s + 1).toDouble / math.sqrt(var18.toDouble / 18.0))
      else 0.0
    val trend = if (z >= 1.96) "increasing"
      else if (z <= -1.96) "decreasing" else "none"
    val row = graft.SparkEntry.queries("q_window_mann_kendall")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == n && row.getLong(1) == s &&
      row.getLong(2) == var18)
    assert(row.getDouble(3) == tau && row.getDouble(4) == z &&
      row.getString(5) == trend)
  }

  test("q_agg_theil_sen: median-of-pairwise-slopes replay") {
    // replay needs days too, not just revs
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("c"))
      .groupBy($"day").agg(sum($"c").as("rev"))
      .orderBy($"day").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val slopes = (for {
      i <- rows.indices; j <- i + 1 until rows.length
      dx = java.time.temporal.ChronoUnit.DAYS.between(rows(i)._1, rows(j)._1)
    } yield (r6((rows(j)._2 - rows(i)._2).toDouble / (dx * 100.0)),
        rows(i)._1, rows(j)._1))
      .sortBy(t => (t._1, t._2, t._3))(
        Ordering.Tuple3(Ordering[BigDecimal],
          Ordering.by((d: java.time.LocalDate) => d.toEpochDay),
          Ordering.by((d: java.time.LocalDate) => d.toEpochDay)))
    val np = slopes.length
    val mids = Seq((np + 1) / 2, np / 2 + 1).distinct.map(k => slopes(k - 1)._1)
    val sen = micro((mids.sum / mids.length).toDouble)
    val row = graft.SparkEntry.queries("q_agg_theil_sen")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == rows.length && row.getLong(1) == np)
    assert(row.getDouble(2) == sen)
  }

  test("q_agg_hill_tail: order-statistics replay; heap plan pinned") {
    import org.apache.spark.sql.functions._
    val prices = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", (AggOps.dec($"o_totalprice") * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, c) => (-c, k) }.take(101)
    val ck1 = prices.last._2
    val terms = prices.take(100).map { case (_, c) =>
      r6(math.log(c.toDouble / ck1.toDouble)) }
    val gamma = micro(terms.sum.toDouble / 100)
    val alpha = micro(100.0 / terms.sum.toDouble)
    val df = graft.SparkEntry.queries("q_agg_hill_tail")(spark, sf0001)
    val row = df.collect().head
    assert(row.getLong(0) == 100L && row.getLong(1) == ck1)
    assert(row.getDouble(2) == gamma && row.getDouble(3) == alpha)
    // the only corpus-sized structure is the top-(k+1) heap
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("q_ml_auc_rank: brute-force pairwise AUC equals histogram AUC") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"n_chars").collect()
      .map(r => (if (r.getString(0) == "en") 1 else 0, r.getLong(1) % 97))
    val pos = docs.filter(_._1 == 1).map(_._2)
    val neg = docs.filter(_._1 == 0).map(_._2)
    var wins2 = 0L // 2-scaled: win = 2, tie = 1
    for (p <- pos; q <- neg)
      wins2 += (if (p > q) 2L else if (p == q) 1L else 0L)
    val auc = micro(wins2.toDouble /
      (2.0 * (pos.length.toLong * neg.length).toDouble))
    val gini = micro((wins2 - pos.length.toLong * neg.length).toDouble /
      (pos.length.toLong * neg.length).toDouble)
    val row = graft.SparkEntry.queries("q_ml_auc_rank")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(row.getDouble(2) == auc && row.getDouble(3) == gini)
    // non-vacuous: the scorer must actually separate classes somewhat
    assert(auc != 0.5)
  }

  test("q_search_map_mrr: AP/MRR replay over the oracled BM25 ranking") {
    val ranked = graft.SparkEntry.queries("q_text_bm25_topk")(spark, sf0001)
      .orderBy($"rank").select($"doc_id").as[Long].collect().toSeq
    val terms = Set("vector", "stream", "hash")
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
    val rel = docs
      .filter(r => terms.subsetOf(r.getString(1).split(" ").toSet))
      .map(_.getLong(0)).toSet
    val flags = ranked.map(d => if (rel(d)) 1 else 0)
    val got = graft.SparkEntry.queries("q_search_map_mrr")(spark, sf0001)
      .orderBy($"k").collect()
    val firstRel = flags.indexOf(1) match {
      case -1 => None; case i => Some(i + 1)
    }
    Seq(5, 10, 20).zip(got).foreach { case (k, row) =>
      val cut = flags.take(k)
      val hits = cut.sum
      val pterms = cut.zipWithIndex.collect { case (1, i) =>
        r6(cut.take(i + 1).sum.toDouble / (i + 1)) }
      val ap = micro(pterms.sum.toDouble / math.min(rel.size, k))
      val mrr = firstRel.fold(0.0)(fr => micro(1.0 / fr))
      assert(row.getInt(0) == k && row.getLong(1) == hits)
      assert(row.getDouble(2) == micro(hits.toDouble / k))
      assert(row.getDouble(3) == ap, s"ap@$k")
      assert(row.getDouble(4) == mrr)
    }
    // non-vacuous: the binary relevance set is a PROPER subset of the
    // corpus (270/500 docs at sf0.001 — dense enough that the whole
    // top-20 can legitimately be relevant), and the ranking hits it
    assert(flags.sum > 0)
    assert(rel.nonEmpty && rel.size < docs.length)
  }

  test("q_graph_adamic_adar: wedge replay; predictions are non-edges") {
    val items = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).values
      .map(_.map(_._2).distinct.sorted).toSeq
    val support = scala.collection.mutable.Map[(Long, Long), Int]()
    for (b <- baskets; i <- b.indices; j <- i + 1 until b.length)
      support((b(i), b(j))) = support.getOrElse((b(i), b(j)), 0) + 1
    val edges = support.filter(_._2 >= 2).keySet
    val adj = scala.collection.mutable.Map[Long, List[Long]]()
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil)
      adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val deg = adj.view.mapValues(_.size).toMap
    val acc = scala.collection.mutable.Map[(Long, Long), (Long, BigDecimal)]()
    for ((w, ns) <- adj; u <- ns; v <- ns if u < v) {
      val (c, a) = acc.getOrElse((u, v), (0L, BigDecimal(0)))
      acc((u, v)) = (c + 1, a + r6(1.0 / math.log(deg(w).toDouble)))
    }
    val expected = acc.toSeq
      .filterNot { case (p, _) => edges(p) }
      .map { case ((u, v), (c, a)) => (u, v, c, a.toDouble) }
      .sortBy { case (u, v, _, a) => (-a, u, v) }.take(20)
    val got = graft.SparkEntry.queries("q_graph_adamic_adar")(spark, sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // non-vacuous: real multi-neighbor predictions exist, and none of
    // the predicted links is already an edge
    assert(got.exists(_._3 >= 2))
    assert(got.forall { case (u, v, _, _) => !edges((u, v)) })
  }

  test("q_text_rake: segmentation + deg/freq replay; stop-free phrases") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stop = graft.text.Stopwords.tokenSet
    // phrases: maximal stopword-free runs, one entry per occurrence
    val phraseOcc = docs.flatMap { case (_, text) =>
      val toks = text.split(" ", -1)
      val out = scala.collection.mutable.ListBuffer[List[String]]()
      var cur = scala.collection.mutable.ListBuffer[String]()
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) { out += cur.toList; cur.clear() } }
        else cur += t
      }
      if (cur.nonEmpty) out += cur.toList
      out.toList
    }
    val freq = phraseOcc.flatten.groupBy(identity).view.mapValues(_.size)
    val deg = phraseOcc.flatMap(p => p.map(w => (w, p.length)))
      .groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum)
    val scored = phraseOcc.groupBy(_.mkString(" ")).map { case (ph, occ) =>
      val words = occ.head
      val score = words.map(w =>
        r6(deg(w).toDouble / freq(w).toDouble)).sum
      (ph, words.length.toLong, occ.length.toLong, score.toDouble)
    }.toSeq.sortBy { case (ph, _, _, s) => (-s, ph) }.take(20)
    val got = graft.SparkEntry.queries("q_text_rake")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == scored)
    // structural: no phrase contains a stopword; multiword phrases rank
    // (long collocations outscore lone words — the RAKE point) and the
    // CORPUS has repeated phrases (118 dup phrases at sf0.001 — they
    // just score below the top-20, which is fine)
    assert(got.forall(_._1.split(" ").forall(t => !stop(t))))
    assert(got.exists(_._2 > 1))
    assert(phraseOcc.map(_.mkString(" ")).groupBy(identity)
      .exists(_._2.length > 1))
    // the engine's top-k is a heap, not a global sort
    val plan = graft.SparkEntry.queries("q_text_rake")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
