package graft.ops

import graft.SparkTestBase

/** Round-13 fifth wave: independent replays + the interval-join plan
  * pin (streaming top-k is pinned in StatefulStreamingSpec). */
class Wave13eSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  test("q_join_interval_overlap: brute-force replay; equi-join plan") {
    import org.apache.spark.sql.functions._
    val iv = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("s"))
      .collect().map { r =>
        val s = r.getDate(2).toLocalDate
        (r.getLong(0), r.getLong(1), s,
          s.plusDays(1 + (r.getLong(0) % 5)))
      }
    val expected = iv.groupBy(_._2).toSeq.flatMap { case (c, os) =>
      val n = (for {
        i <- os.indices; j <- i + 1 until os.length
        a = os(i); b = os(j)
        if a._1 != b._1 &&
          !a._3.isAfter(b._4) && !b._3.isAfter(a._4) // s<=e both ways
      } yield 1).size
      if (n > 0) Some((c, n.toLong)) else None
    }.sortBy(_._1)
    val df = graft.SparkEntry.queries("q_join_interval_overlap")(
      spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // non-vacuous: overlaps exist but not every customer has one
    assert(got.nonEmpty && got.length < iv.map(_._2).distinct.length)
    // the scale point: candidates meet through an EQUI join on
    // (customer, week) — no nested loop, no cartesian in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(600))
  }

  test("q_ml_power_analysis: moment replay; n scales inversely with mde²") {
    import org.apache.spark.sql.functions._
    val ys = graft.Tables.orders(spark, sf0001)
      .select(expr(
        "cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint) div 100"))
      .as[Long].collect()
    val n = ys.length.toLong
    val sy = ys.sum
    val syy = ys.map(y => BigInt(y) * BigInt(y)).sum
    val mean = sy.toDouble / n
    val variance = (BigInt(n) * syy - BigInt(sy) * BigInt(sy)).toDouble /
      (n * (n - 1)).toDouble
    val z = 1.959964 + 0.841621
    val got = graft.SparkEntry.queries("q_ml_power_analysis")(spark, sf0001)
      .orderBy($"mde_pct").collect()
    Seq(1, 2, 5).zip(got).foreach { case (pct, row) =>
      val mde = 0.01 * pct * mean
      assert(row.getInt(0) == pct && row.getLong(1) == n)
      assert(row.getDouble(2) == micro(mean))
      assert(row.getDouble(3) == micro(variance))
      assert(row.getLong(4) ==
        math.ceil(2.0 * z * z * variance / (mde * mde)).toLong)
    }
    // quadratic law: halving the MDE quadruples the sample (±ceil slack)
    val n1 = got(0).getLong(4); val n2 = got(1).getLong(4)
    assert(math.abs(n1 - 4L * n2) <= 4L, s"$n1 vs 4x$n2")
  }
}
