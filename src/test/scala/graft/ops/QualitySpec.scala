package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-anonymity audit semantics against a driver-side reference. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("k-anonymity flags exactly the sub-k quasi-identifier groups") {
    val got = QualityOps.kAnonymity(spark, sf0001)
      .select("event_type", "day", "value_band", "n_users", "n_rows")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val rows = graft.Tables.events(spark, sf0001)
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        floor($"value" / 10).cast("long").as("vb"), $"user_id")
      .as[(String, String, Long, Long)].collect()
    val want = rows.groupBy(r => (r._1, r._2, r._3))
      .map { case ((t, d, vb), xs) =>
        (t, d, vb, xs.map(_._4).distinct.length.toLong, xs.length.toLong)
      }
      .filter(_._4 < 5).toSet
    assert(got == want)
    assert(want.nonEmpty && want.size < rows.length,
      "audit must be non-vacuous and selective at sf0.001")
  }
}
