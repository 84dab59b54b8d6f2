package graft.llm

import graft.SparkTestBase

/** Centroid-similarity report: driver-side exact-integer replay. */
class CentroidSpec extends SparkTestBase {
  import spark.implicits._

  test("centroid cosine matches an exact integer replay") {
    val rows = graft.Tables.embeddings(spark, sf0001)
      .select("label", "embedding").as[(Int, Seq[Float])].collect()
    val sums = rows.groupBy(_._1).map { case (l, vs) =>
      val qvs = vs.map(_._2.map(x => math.floor(x.toDouble * 1000.0).toLong))
      l -> ((vs.length.toLong, qvs.toSeq.transpose.map(_.sum)))
    }
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dt = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dt / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val got = SimSearchOps.centroidSim(spark, sf0001)
      .as[(Int, Int, Long, Long, Double)].collect()
    val labels = sums.keys.toSeq.sorted
    assert(got.length == labels.size * (labels.size - 1) / 2)
    got.foreach { case (la, lb, na, nb, c) =>
      assert(la < lb)
      assert(na == sums(la)._1 && nb == sums(lb)._1, s"pair ($la,$lb) n")
      assert(math.abs(c - cos(sums(la)._2, sums(lb)._2)) < 1e-6,
        s"pair ($la,$lb) cos")
    }
  }

  test("source gini matches the rank-formula replay") {
    val vols = graft.Tables.documents(spark, sf0001)
      .select("source", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sum }
    val xs = vols.toSeq.sortBy { case (s, x) => (x, s) }.map(_._2)
    val n = xs.length
    val t = xs.sum
    val num = xs.zipWithIndex.map { case (x, i0) =>
      (2L * (i0 + 1) - n - 1) * x
    }.sum
    val want = num.toDouble / (n.toLong * t).toDouble
    val got = graft.ops.QualityOps.sourceGini(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    val (gn, gt, gg) = got.head
    assert(gn == n && gt == t)
    assert(math.abs(gg - want) < 1e-6)
    assert(gg > 0.0 && gg < 1.0, "gini must be non-degenerate on the fixture")
  }

  test("lexical diversity matches a count replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select("lang", "text").as[(String, String)].collect()
    val byLang = docs.groupBy(_._1).map { case (lang, ds) =>
      val toks = ds.flatMap(_._2.split(" "))
      val counts = toks.groupBy(identity).map { case (_, v) => v.length }
      val nt = toks.length.toDouble
      val entropy = -counts.map { c =>
        BigDecimal.valueOf(c / nt * math.log(c / nt))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.doubleValue
      lang -> (counts.size.toLong, toks.length.toLong,
        counts.size / nt, entropy)
    }
    val got = graft.text.CooccurOps.lexicalDiversity(spark, sf0001)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.length == byLang.size)
    got.foreach { case (lang, types, tokens, ttr, ent) =>
      val (wTy, wTo, wTtr, wEnt) = byLang(lang)
      assert((types, tokens) == (wTy, wTo), s"lang $lang counts")
      assert(math.abs(ttr - wTtr) < 1e-6, s"lang $lang ttr")
      assert(math.abs(ent - wEnt) < 1e-6, s"lang $lang entropy")
      assert(ent > 0.0, s"lang $lang entropy must be non-degenerate")
    }
  }
}
