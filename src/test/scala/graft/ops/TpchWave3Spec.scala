package graft.ops

import graft.SparkTestBase

/** Round-11 wave: repo-side evidence for the TPC-H closure queries
  * Q2/Q11/Q20 — the last three of the 22 (Q1 is the flagship in
  * AggOps; Q3-Q19 wave 1 in SqlOps; Q7-Q22 wave 2 above). Pattern
  * matches TpchWaveSpec/TpchWave2Spec: an independent driver-side
  * replay in plain Scala over the bounded sf0.001 fixture (never a
  * rerun of the query's own expressions), plus plan pins for the
  * topologies the 100 TB story depends on. */
class TpchWave3Spec extends SparkTestBase {

  private def bd2(d: Double) = BigDecimal(d).setScale(2)

  test("q_sql_tpch_q2: min-cost supplier matches a full driver-side replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_sql_tpch_q2")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // replay (empty result must match an empty replay — the size+type
    // gate can keep no part in a tiny slice)
    val eurKeys = graft.Tables.region(spark, sf0001)
      .filter($"r_name" === "EUROPE").select($"r_regionkey")
      .collect().map(_.getInt(0)).toSet
    val natName = graft.Tables.nation(spark, sf0001)
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2))).toMap
    val eurSupp = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"s_nationkey")
      .collect()
      .flatMap { r =>
        val (nn, rk) = natName(r.getInt(3))
        if (eurKeys(rk))
          Some(r.getLong(0) -> (r.getString(1), r.getDouble(2), nn))
        else None
      }.toMap
    val parts = graft.Tables.part(spark, sf0001)
      .filter($"p_size" === 15 && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cost = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_suppkey", $"l_extendedprice").collect()
      .filter(r => eurSupp.contains(r.getLong(1)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(r => bd2(r.getDouble(2))).min }
    val bestPerPart = cost.groupBy(_._1._1).map { case (pk, m) =>
      pk -> m.values.min }
    val expected = cost.toSeq
      .filter { case ((pk, _), c) =>
        parts.contains(pk) && c == bestPerPart(pk) }
      .map { case ((pk, sk), c) =>
        val (sn, bal, nn) = eurSupp(sk)
        (bal, sn, nn, pk, parts(pk), c.toDouble)
      }
      .sortBy { case (bal, sn, nn, pk, _, _) => (-bal, nn, sn, pk) }
      .take(100)
    val got = df.collect().map(r => (r.getDouble(0), r.getString(1),
      r.getString(2), r.getLong(3), r.getString(4), r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("q_sql_tpch_q3 (wave 1): top-10 revenue orders match a driver-side replay") {
    import spark.implicits._
    // closes the one wave-1 evidence gap: Q3 (SqlOps) had plan+oracle
    // coverage but no repo-side replay. Semantics per SqlOps.tpchQ3:
    // BUILDING segment, orders before 1998-01-01, lineitems shipped
    // after it, revenue per (orderkey, DATE(orderdate)), top 10 by
    // (revenue desc, orderkey).
    val cut = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val bldg = graft.Tables.customer(spark, sf0001)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val ord = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate").collect()
      .filter { r =>
        r.getAs[java.time.LocalDateTime](2).isBefore(cut) &&
          bldg(r.getLong(1))
      }
      .map(r => r.getLong(0) ->
        r.getAs[java.time.LocalDateTime](2).toLocalDate).toMap
    val rev = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .collect()
      .filter { r =>
        r.getAs[java.time.LocalDateTime](1).isAfter(cut) &&
          ord.contains(r.getLong(0))
      }
      .groupBy(_.getLong(0))
      .map { case (ok, rs) =>
        ok -> rs.map(r => bd2(r.getDouble(2)) *
          (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(4))).sum
      }
    val expected = rev.toSeq.map { case (ok, v) =>
      (ok, ord(ok).toString,
        v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (ok, _, r) => (-r, ok) }.take(10).toList
    val got = graft.SparkEntry.queries("q_sql_tpch_q3")(spark, sf0001)
      .collect().map(r => (r.getLong(0),
        String.valueOf(r.get(1)), r.getDouble(2))).toList
    assert(got === expected)
  }

  test("q_sql_tpch_q11: above-mean parts match; threshold is scale-invariant") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_sql_tpch_q11")(spark, sf0001)
    val nat3 = graft.Tables.nation(spark, sf0001)
      .filter($"n_name" === "NATION_3")
      .select($"n_nationkey").collect().map(_.getInt(0)).toSet
    val nsupp = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_nationkey").collect()
      .filter(r => nat3(r.getInt(1))).map(_.getLong(0)).toSet
    val price = graft.Tables.part(spark, sf0001)
      .select($"p_partkey", $"p_retailprice").collect()
      .map(r => r.getLong(0) -> bd2(r.getDouble(1))).toMap
    val value = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_suppkey", $"l_quantity").collect()
      .filter(r => nsupp(r.getLong(1)))
      .groupBy(_.getLong(0))
      .map { case (pk, rs) =>
        pk -> rs.map(r => price(pk) * bd2(r.getDouble(2))).sum }
    val total = value.values.sum
    val cnt = value.size
    val expected = value.toSeq
      .filter { case (_, v) => v.toDouble * cnt > 2.0 * total.toDouble }
      .map { case (pk, v) =>
        (pk, v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (pk, v) => (-v, pk) }
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    // the kept set is a strict, non-empty subset: the scale-invariance
    // contract (a fixed fraction went vacuous at sf0.1; 2x-mean cannot)
    assert(got.nonEmpty && got.size < cnt, s"${got.size} of $cnt")
  }

  test("q_sql_tpch_q20: dominant red-part suppliers match a replay") {
    import spark.implicits._
    val lo = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1999-01-01T00:00:00")
    val red = graft.Tables.part(spark, sf0001)
      .filter($"p_name".startsWith("red"))
      .select($"p_partkey").collect().map(_.getLong(0)).toSet
    val qty = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_suppkey", $"l_quantity", $"l_shipdate")
      .collect()
      .filter { r =>
        val t = r.getAs[java.time.LocalDateTime](3)
        red(r.getLong(0)) && !t.isBefore(lo) && t.isBefore(hi)
      }
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(r => bd2(r.getDouble(2))).sum }
    val totalPerPart = qty.groupBy(_._1._1).map { case (pk, m) =>
      pk -> m.values.sum }
    val dominant = qty.collect {
      case ((pk, sk), q) if q * 2 > totalPerPart(pk) => sk }.toSet
    val nat1 = graft.Tables.nation(spark, sf0001)
      .filter($"n_name" === "NATION_1")
      .select($"n_nationkey").collect().map(_.getInt(0)).toSet
    val expected = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_name", $"s_nationkey").collect()
      .filter(r => nat1(r.getInt(2)) && dominant(r.getLong(0)))
      .map(r => (r.getString(1), "NATION_1")).toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_sql_tpch_q20")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === expected)
  }
}
