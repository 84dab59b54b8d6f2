package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the WITH RECURSIVE calendar (Spark 4 UnionLoop): the generated
  * month series is exactly the closed span of the data, zero-order
  * months survive the left join, and the per-month sums equal a plain
  * groupBy recompute.
  */
class SqlRecursiveSpec extends SparkTestBase {
  import spark.implicits._

  test("recursive month calendar is gap-free and sums match a groupBy") {
    val got = SqlOps.recursiveCalendar(spark, sf0001)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))

    val orders = graft.Tables.orders(spark, sf0001)
      .select(trunc($"o_orderdate".cast("date"), "MM").as("m"),
        $"o_totalprice")
    val byMonth = orders.groupBy($"m")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(14,2)")), 2)
          .cast("double").as("total"))
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getDouble(2))).toMap

    // series is contiguous: row count == months between min and max + 1
    val (lo, hi) = (byMonth.keys.min, byMonth.keys.max)
    val span = {
      val (ly, lm) = (lo.substring(0, 4).toInt, lo.substring(5, 7).toInt)
      val (hy, hm) = (hi.substring(0, 4).toInt, hi.substring(5, 7).toInt)
      (hy - ly) * 12 + (hm - lm) + 1
    }
    assert(got.length == span, s"expected $span months, got ${got.length}")
    assert(got.head._1 == lo && got.last._1 == hi)
    // every month matches the groupBy; absent months are (0, 0.0)
    got.foreach { case (m, n, total) =>
      val (wn, wt) = byMonth.getOrElse(m, (0L, 0.0))
      assert(n == wn && total == wt, s"$m: ($n,$total) != ($wn,$wt)")
    }
  }
}
