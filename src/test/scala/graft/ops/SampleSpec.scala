package graft.ops

import graft.SparkTestBase

/** Pins the non-oracled sampling operator: same seed -> same rows, and
  * realized fractions within loose binomial bounds. */
class SampleSpec extends SparkTestBase {
  import spark.implicits._

  test("q_ml_sample_seeded is deterministic and in-bounds") {
    val once = MlOps.sampleSeeded(spark, sf0001).collect()
    val twice = MlOps.sampleSeeded(spark, sf0001).collect()
    assert(once.sameElements(twice))
    val total = graft.Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    once.foreach { r =>
      val (flag, bern) = (r.getString(0), r.getLong(1))
      val frac = bern.toDouble / total(flag)
      assert(frac > 0.05 && frac < 0.16, s"$flag bernoulli frac $frac")
    }
  }
}
