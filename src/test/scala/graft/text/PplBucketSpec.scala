package graft.text

import graft.SparkTestBase

/** Pins the CCNet-style perplexity bucketing report: complete deciles
  * per language, contiguous non-overlapping score ranges within a
  * language, and the declared 70%-keep rule.
  */
class PplBucketSpec extends SparkTestBase {

  test("ppl buckets are complete deciles with ordered ranges and a 7/10 keep") {
    val rows = TextOps.pplBucket(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == (1 to 10), s"$lang buckets")
      // decile sizes differ by at most 1 (ntile contract)
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes ${sizes.toSeq}")
      // ordered DESC by score: bucket k's min >= bucket k+1's max
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._4 >= lo._5, s"$lang ranges overlap: $hi vs $lo")
        case _ =>
      }
      assert(bs.count(_._6 == 1) == 7 && bs.count(_._6 == 0) == 3)
    }
  }
}
