package graft.ops

import graft.SparkTestBase

/** Accuracy contracts for the approximate aggregates that can't be
  * DuckDB-oracled (engine-specific sketch internals, SURVEY.md §2.5-4). */
class ApproxSpec extends SparkTestBase {

  test("approx_percentile tracks exact percentiles within the GK rank bound") {
    def byFlag(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
      df.collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(AggOps.percentiles(spark, sf0001))
    val approx = byFlag(AggOps.approxPercentiles(spark, sf0001))
    // GK with accuracy 10000 on groups of ~2k rows is rank-exact up to
    // interpolation: exact percentile interpolates between neighbors,
    // the sketch returns a real element — allow one quantity step (1.0)
    exact.foreach { case (flag, es) =>
      val as = approx(flag)
      es.zip(as).foreach { case (e, a) =>
        assert(math.abs(e - a) <= 1.0, s"$flag: exact $e vs approx $a")
      }
    }
    // deterministic across runs (fixed data order, deterministic sketch)
    assert(AggOps.approxPercentiles(spark, sf0001).collect()
      .sameElements(AggOps.approxPercentiles(spark, sf0001).collect()))
  }
}
