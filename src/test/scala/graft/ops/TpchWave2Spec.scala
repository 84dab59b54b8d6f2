package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-11 wave: repo-side evidence for the wave-2 TPC-H queries
  * (Q7/Q8/Q9/Q12/Q13/Q15/Q16/Q17/Q21/Q22 in TpchOps) that landed in
  * the round-10 snapshot with driver-oracle coverage only. Pattern
  * matches TpchWaveSpec: independent driver-side recomputation (plain
  * Scala over the bounded sf0.001 fixture) or an algebraic invariant —
  * never a rerun of the query's own expressions — plus plan pins for
  * the join topologies the 100 TB story depends on. */
class TpchWave2Spec extends SparkTestBase {

  test("q_sql_tpch_q7: plan pins + driver-side nation-pair volume replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_sql_tpch_q7")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // full replay in plain Scala over the bounded sf0.001 fixture
    // (an empty result must match an empty replay — the symmetric OR
    // can legitimately keep nothing in a tiny slice)
    val lo = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1998-01-01T00:00:00")
    val nation = graft.Tables.nation(spark, sf0001)
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppNat = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_nationkey").collect()
      .map(r => r.getLong(0) -> nation(r.getInt(1))).toMap
    val custNat = graft.Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_nationkey").collect()
      .map(r => r.getLong(0) -> nation(r.getInt(1))).toMap
    val ordCust = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vols = scala.collection.mutable.Map
      .empty[(String, String, Int), BigDecimal].withDefaultValue(BigDecimal(0))
    graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        $"l_extendedprice", $"l_discount").collect()
      .foreach { r =>
        val ship = r.getAs[java.time.LocalDateTime](2)
        if (!ship.isBefore(lo) && ship.isBefore(hi)) {
          val sn = suppNat(r.getLong(1))
          val cn = custNat(ordCust(r.getLong(0)))
          if ((sn == "NATION_1" && cn == "NATION_2") ||
              (sn == "NATION_2" && cn == "NATION_1")) {
            vols((sn, cn, ship.getYear)) +=
              BigDecimal(r.getDouble(3)).setScale(2) *
                (BigDecimal(1) - BigDecimal(r.getDouble(4)).setScale(4))
          }
        }
      }
    val expected = vols.toSeq.map { case ((s, c, y), v) =>
      (s, c, y, v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (t._1, t._2, t._3))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("q_sql_tpch_q8 plan: dims broadcast; share identity holds per year") {
    val df = graft.SparkEntry.queries("q_sql_tpch_q8")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nv, tv, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nv >= 0 && tv >= nv, s"volumes inconsistent: $nv / $tv")
      assert(math.abs(share - BigDecimal(nv / tv)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("q_sql_tpch_q21: matches a driver-side textbook EXISTS/NOT-EXISTS replay") {
    import spark.implicits._
    // independent reimplementation of the TEXTBOOK form (per late line:
    // EXISTS another supplier on the order AND NOT EXISTS another LATE
    // supplier), plain Scala over the collected sf0.001 fixture —
    // pins the one-aggregate rewrite's equivalence repo-side, not just
    // via the driver's DuckDB hash.
    val ord = graft.Tables.orders(spark, sf0001)
      .filter($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    val lines = graft.Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2)))
      .filter { case (ok, _, _) => ord.contains(ok) }
    val byOrder = lines.groupBy(_._1)
    val suppName = graft.Tables.supplier(spark, sf0001)
      .select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def late(ok: Long, ship: java.time.LocalDateTime): Boolean =
      ship.isAfter(ord(ok).plusDays(60))
    val numwait = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((ok, ls) <- byOrder; (_, supp, ship) <- ls if late(ok, ship)) {
      val othersExist = ls.exists(_._2 != supp)
      val otherLate = ls.exists { case (_, s2, sh2) =>
        s2 != supp && late(ok, sh2) }
      if (othersExist && !otherLate) numwait(suppName(supp)) += 1
    }
    val expected = numwait.toSeq
      .sortBy { case (n, w) => (-w, n) }.take(20)
    val got = graft.SparkEntry.queries("q_sql_tpch_q21")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q_sql_tpch_q13: histogram covers every customer exactly once") {
    val rows = graft.SparkEntry.queries("q_sql_tpch_q13")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // Σ custdist = |customer| (left outer keeps zero-order customers)
    val nCust = graft.Tables.customer(spark, sf0001).count()
    assert(rows.map(_._2).sum === nCust)
    // Σ c_count × custdist = |orders not excluded by the ON predicate|
    import spark.implicits._
    val kept = graft.Tables.orders(spark, sf0001)
      .filter($"o_orderpriority" =!= "4-NOT SPECIFIED").count()
    assert(rows.map { case (c, d) => c * d }.sum === kept)
  }

  test("q_sql_tpch_q15: winner matches a driver-side max-revenue recount") {
    import spark.implicits._
    val lo = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val hi = java.time.LocalDateTime.parse("1996-04-01T00:00:00")
    val revBySupp = graft.Tables.lineitem(spark, sf0001)
      .select($"l_suppkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .collect()
      .filter { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        !t.isBefore(lo) && t.isBefore(hi)
      }
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => BigDecimal(r.getDouble(2)).setScale(2) *
          (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(4))).sum
      }
    val maxRev = revBySupp.values.max
    val winners = revBySupp.filter(_._2 == maxRev).keys.toSeq.sorted
    val got = graft.SparkEntry.queries("q_sql_tpch_q15")(spark, sf0001)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === winners)
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) -
        maxRev.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("q_sql_tpch_q17: threshold really is 0.2x the part's avg quantity") {
    import spark.implicits._
    val partKeys = graft.Tables.part(spark, sf0001)
      .filter($"p_brand" === "Brand#3" && $"p_size" < 10)
      .select($"p_partkey").collect().map(_.getLong(0)).toSet
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice").collect()
      .filter(r => partKeys(r.getLong(0)))
    val avgQty = li.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map(_.getDouble(1)).sum / rs.length }
    val keptN = li.count(r => r.getDouble(1) < 0.2 * avgQty(r.getLong(0)))
    val row = graft.SparkEntry.queries("q_sql_tpch_q17")(spark, sf0001)
      .collect().head
    assert(row.getAs[Long]("n_lines") === keptN.toLong)
  }

  test("q_sql_tpch_q22: numcust recounted for every country code") {
    import spark.implicits._
    val codes = Set(1, 4, 7, 10, 13, 16, 19)
    val cust = graft.Tables.customer(spark, sf0001)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .filter { case (_, nk, _) => codes(nk) }
    val pos = cust.filter(_._3 > 0.0)
    val (cnt, total) = (pos.length,
      pos.map(c => BigDecimal(c._3).setScale(2)).sum)
    val recent = graft.Tables.orders(spark, sf0001)
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
      .select($"o_custkey").collect().map(_.getLong(0)).toSet
    val expected = cust
      .filter { case (ck, _, bal) =>
        BigDecimal(bal).setScale(2) * cnt > total && !recent(ck) }
      .groupBy(_._2).map { case (nk, cs) => (nk, cs.length.toLong) }
    val got = graft.SparkEntry.queries("q_sql_tpch_q22")(spark, sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("q_sql_tpch_q16: head supplier_cnt recounted; exclusion honored") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_sql_tpch_q16")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val head = rows.head
    val (brand, ptype, psize) =
      (head.getString(0), head.getString(1), head.getInt(2))
    val excl = graft.Tables.supplier(spark, sf0001)
      .filter($"s_name".like("%7")).select($"s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val parts = graft.Tables.part(spark, sf0001)
      .filter($"p_brand" === brand && $"p_type" === ptype &&
        $"p_size" === psize)
      .select($"p_partkey").collect().map(_.getLong(0)).toSet
    val direct = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_suppkey").collect()
      .filter(r => parts(r.getLong(0)) && !excl(r.getLong(1)))
      .map(_.getLong(1)).distinct.length
    assert(head.getLong(3) === direct.toLong)
  }

  test("q_sql_tpch_q9/q12 plans: part/dim legs broadcast, no cartesian") {
    Seq("q_sql_tpch_q9", "q_sql_tpch_q12").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sf0001)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(2000)}")
      assert(df.collect().nonEmpty, q)
    }
  }
}
