package graft.llm

import graft.SparkTestBase

/** Independent replay of the dedup threshold curve: blocked all-pairs
  * Jaccard recomputed with plain collections, swept over the same 8
  * cutoffs; monotonicity of the curve asserted as a sanity bound. */
class ThresholdCurveSpec extends SparkTestBase {
  import spark.implicits._

  test("q_dedup_threshold_curve: blocked all-pairs replay") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 100,
        r.getString(3)))
    val sh = docs.flatMap { case (id, lang, lb, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      if (ws.length < 3) None
      else Some(((lang, lb), id,
        ws.sliding(3).map(_.mkString(" ")).toSet))
    }
    val pairs = sh.groupBy(_._1).values.flatMap { g =>
      val s = g.toSeq.sortBy(_._2)
      for (i <- s.indices; j <- i + 1 until s.size) yield {
        val inter = (s(i)._3 & s(j)._3).size
        val jac = inter.toDouble / (s(i)._3.size + s(j)._3.size - inter)
        (s(i)._2, s(j)._2,
          BigDecimal(jac).setScale(6,
            scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.filter(_._3 >= 0.2).toSeq
    val expected = (0 to 7).map { i =>
      val th = (2 + i) / 10.0
      val f = pairs.filter(_._3 >= th)
      (th, f.size.toLong,
        f.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }
    val got = DedupOps.thresholdCurve(spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the curve must be monotone non-increasing in both columns
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3)
    }
    assert(got.head._2 > 0, "no candidate pairs at the 0.2 floor (vacuous)")
  }
}
