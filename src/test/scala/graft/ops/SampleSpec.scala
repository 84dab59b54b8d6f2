package graft.ops

import graft.SparkTestBase

/** Pins the non-oracled sampling operator: same seed -> same rows, and
  * realized fractions within loose binomial bounds. */
class SampleSpec extends SparkTestBase {
  import spark.implicits._

  test("q_ml_train_predict: deterministic fit, predictions in domain, better than chance") {
    val once = MlOps.trainPredict(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val twice = MlOps.trainPredict(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(once.sameElements(twice))
    assert(once.forall(r => r._3 == 0.0 || r._3 == 1.0))
    val acc = once.count(r => r._2 == r._3).toDouble / once.length
    assert(acc > 0.6, s"training-set accuracy $acc")
  }

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
