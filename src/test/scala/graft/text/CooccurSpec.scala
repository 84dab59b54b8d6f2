package graft.text

import graft.SparkTestBase

/** Co-occurrence / corpus-LM operators: driver-side replays of the
  * skip-gram PPMI counts, the add-one bigram-LM NLL (exact decimal-sum
  * discipline included), the vocab-coverage report, and the hybrid-RRF
  * fusion's internal consistency against its BM25 leg. */
class CooccurSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf0001)
    .select("doc_id", "text", "lang").as[(Long, String, String)].collect()

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .doubleValue

  test("skipgram ppmi matches a driver-side co-occurrence replay") {
    val toks = docs.map { case (id, t, _) => (id, t.split(" ")) }
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length }
    val nUni = uni.values.map(_.toLong).sum.toDouble
    val pairs = toks.flatMap { case (_, ts) =>
      for {
        i <- ts.indices; o <- 1 to 2 if i + o < ts.length
        a = ts(i); b = ts(i + o)
      } yield (if (a <= b) (a, b) else (b, a))
    }
    val pc = pairs.groupBy(identity).map { case (k, v) => k -> v.length }
    val nPair = pc.values.map(_.toLong).sum.toDouble
    val want = pc.filter(_._2 >= 5).map { case ((a, b), cab) =>
      val ppmi = math.max(0.0,
        math.log((cab / nPair) / ((uni(a) / nUni) * (uni(b) / nUni))))
      (s"$a $b", (cab.toLong, uni(a).toLong, uni(b).toLong, round6(ppmi)))
    }
    val got = CooccurOps.skipgramPpmi(spark, sf0001)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length == 20)
    got.foreach { case (pair, cab, ca, cb, ppmi) =>
      val (wCab, wCa, wCb, wPpmi) = want(pair)
      assert((cab, ca, cb) == (wCab, wCa, wCb), s"counts for $pair")
      assert(math.abs(ppmi - wPpmi) < 1e-6, s"ppmi for $pair")
    }
    // top-20 really is the global maximum of the replay's ranking
    val wantTop = want.toSeq.sortBy { case (p, (_, _, _, v)) => (-v, p) }
      .take(20).map(_._1)
    assert(got.map(_._1).toSeq == wantTop)
  }

  test("bigram LM nll matches an exact decimal-sum replay") {
    val toks = docs.map { case (id, t, _) => (id, t.split(" ")) }
    val bgs = toks.flatMap { case (id, ts) =>
      ts.indices.dropRight(1).map(i => (id, ts(i), ts(i + 1)))
    }
    val cab = bgs.groupBy { case (_, a, b) => (a, b) }
      .map { case (k, v) => k -> v.length }
    val ctx = cab.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val v = toks.flatMap(_._2).distinct.length
    val want = bgs.groupBy(_._1).map { case (id, rows) =>
      val lps = rows.map { case (_, a, b) =>
        BigDecimal.valueOf(round6(
          math.log((cab((a, b)) + 1.0) / (ctx(a) + v).toDouble)))
      }
      val avg = -(lps.sum.doubleValue) / rows.length
      id -> (rows.length.toLong, math.floor(avg * 1e6).toLong / 1e6)
    }
    val got = CooccurOps.bigramLmNll(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(got.length == want.size)
    got.foreach { case (id, n, nll) =>
      assert((n, nll) == want(id), s"doc $id")
    }
  }

  test("vocab coverage matches an integer-count replay") {
    val toks = docs.flatMap { case (id, t, lang) =>
      t.split(" ").map(tok => (id, lang, tok))
    }
    val vocab = toks.map(_._3).groupBy(identity)
      .map { case (k, vs) => (k, vs.length) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(100).map(_._1).toSet
    val want = toks.groupBy(_._2).map { case (lang, rows) =>
      val nTok = rows.length
      val nCov = rows.count(r => vocab(r._3))
      lang -> (rows.map(_._1).distinct.length.toLong, nTok.toLong,
        nCov.toLong, round6(nCov.toDouble / nTok),
        rows.collect { case (_, _, t) if !vocab(t) => t }.distinct.length.toLong)
    }
    val got = CooccurOps.vocabCoverage(spark, sf0001)
      .as[(String, Long, Long, Long, Double, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (lang, nd, nt, nc, cov, oov) =>
      val (wNd, wNt, wNc, wCov, wOov) = want(lang)
      assert((nd, nt, nc, oov) == (wNd, wNt, wNc, wOov), s"lang $lang counts")
      assert(math.abs(cov - wCov) < 1e-9, s"lang $lang coverage")
    }
  }

  test("hybrid rrf fuses consistently with its BM25 leg") {
    val bm = SearchOps.bm25TopK(spark, sf0001)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    val got = SearchOps.hybridRrf(spark, sf0001)
      .as[(Int, Long, Option[Int], Option[Int], Double)].collect()
    assert(got.map(_._1).toSeq == (1 to 10))
    got.foreach { case (_, id, rKw, rVec, rrf) =>
      // keyword ranks echo the BM25 leg exactly
      assert(rKw == bm.get(id), s"doc $id r_kw")
      assert(rKw.isDefined || rVec.isDefined, s"doc $id in neither leg")
      val want = round6(rKw.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rVec.map(r => 1.0 / (60 + r)).getOrElse(0.0))
      assert(math.abs(rrf - want) < 1e-9, s"doc $id rrf")
    }
    // fusion score really is sorted desc with doc_id tiebreak
    got.sliding(2).foreach { case Array((_, idA, _, _, a), (_, idB, _, _, b)) =>
      assert(a > b || (a == b && idA < idB))
    }
    // the PRF seeds (top-3 BM25 docs with embeddings) are excluded from
    // the vector leg: their r_vec must be absent
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id").as[Long].collect().toSet
    val seeds = bm.toSeq.sortBy(_._2).iterator
      .filter(kv => emb(kv._1)).take(3).map(_._1).toSet
    got.foreach { case (_, id, _, rVec, _) =>
      if (seeds(id)) assert(rVec.isEmpty, s"seed $id leaked into vector leg")
    }
  }
}
