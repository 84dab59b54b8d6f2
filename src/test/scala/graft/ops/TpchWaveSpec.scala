package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-10 wave: TPC-H Q5/Q18 shapes, the URL parse pack, and the
  * portable integer k-means. Each test is an INDEPENDENT recomputation
  * (driver-side Scala or an algebraic invariant), not a rerun of the
  * query's own expressions — the DuckDB twin already covers
  * engine-vs-engine equality. */
class TpchWaveSpec extends SparkTestBase {

  test("q_sql_tpch_q5: revenue-ordered, positive, per-nation-distinct") {
    val rows = graft.SparkEntry.queries("q_sql_tpch_q5")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.forall(_ > 0))
    assert(revs.sameElements(revs.sortBy(-_)), "not revenue-descending")
    val names = rows.map(_.getString(0))
    assert(names.distinct.length === names.length)
  }

  test("q_sql_tpch_q5 plan: nation/region legs broadcast, no cartesian") {
    val df = graft.SparkEntry.queries("q_sql_tpch_q5")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_sql_tpch_q18: every kept order really exceeds the quantity cut") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_sql_tpch_q18")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Double]("total_qty") > 300.0))
    val tp = rows.map(_.getAs[Double]("o_totalprice"))
    assert(tp.sameElements(tp.sortBy(-_)), "not totalprice-descending")
    // independent recount of one kept order's quantity from the raw fact
    val key = rows.head.getAs[Long]("o_orderkey")
    val direct = graft.Tables.lineitem(spark, sf0001)
      .filter($"l_orderkey" === key)
      .agg(sum($"l_quantity")).head.getDouble(0)
    assert(math.abs(direct - rows.head.getAs[Double]("total_qty")) < 1e-6)
  }

  test("q_sql_tpch_q6: every filter leg reaches the parquet scan") {
    val df = graft.SparkEntry.queries("q_sql_tpch_q6")(spark, sf0001)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val p = out.toString
    assert(p.contains("PushedFilters"), p.take(2000))
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
      "LessThan(l_quantity,24.0)").foreach { f =>
      assert(p.contains(f), s"filter $f not pushed:\n${p.take(3000)}")
    }
    assert(df.collect().head.getLong(0) > 0)
  }

  test("q_sql_tpch_q4: EXISTS plans as a semi join, counts consistent") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_sql_tpch_q4")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent recount of one priority via a distinct-join
    val pri = rows.head.getString(0)
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val late = graft.Tables.lineitem(spark, sf0001)
      .filter($"l_shipdate" >= hi).select($"l_orderkey").distinct()
    val direct = graft.Tables.orders(spark, sf0001)
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi &&
        $"o_orderpriority" === pri)
      .join(late, $"o_orderkey" === $"l_orderkey").count()
    assert(rows.head.getLong(1) === direct)
  }

  test("q_sql_tpch_q14: promo share consistent and within the revenue") {
    val r = graft.SparkEntry.queries("q_sql_tpch_q14")(spark, sf0001)
      .collect()
    assert(r.length === 1)
    val (promo, total, pct) =
      (r.head.getDouble(0), r.head.getDouble(1), r.head.getDouble(2))
    assert(promo > 0 && total > promo)
    assert(math.abs(pct - BigDecimal(100.0 * promo / total)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("q_sql_tpch_q19: bracket filter matches a driver-side recount") {
    import spark.implicits._
    val r = graft.SparkEntry.queries("q_sql_tpch_q19")(spark, sf0001)
      .collect().head
    val direct = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001),
        $"l_partkey" === $"p_partkey")
      .collect().count { row =>
        val b = row.getAs[String]("p_brand")
        val q = row.getAs[Double]("l_quantity")
        (b == "Brand#1" && q >= 1 && q <= 11) ||
        (b == "Brand#9" && q >= 10 && q <= 20) ||
        (b == "Brand#20" && q >= 20 && q <= 30)
      }
    assert(r.getLong(0) === direct.toLong && r.getDouble(1) > 0)
  }

  test("q_scalar_url: host excludes port, query excludes fragment, norm is canonical") {
    val rows = graft.SparkEntry.queries("q_scalar_url")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val host = r.getAs[String]("host")
      val query = r.getAs[String]("query")
      val frag = r.getAs[String]("frag")
      val norm = r.getAs[String]("norm")
      assert(!host.contains(":"), s"doc $id: port leaked into host $host")
      assert(!query.contains("#"), s"doc $id: fragment leaked into query")
      assert(if (id % 2 == 0) frag == "top" else frag == null)
      assert(if (id % 3 == 0) host.startsWith("www.") else true)
      assert(!norm.startsWith("www.") && !norm.contains(":") &&
        !norm.contains("?"), s"doc $id: norm not canonical: $norm")
      assert(r.getAs[String]("tld") == "com")
      assert(r.getAs[String]("page") == (id % 7).toString)
    }
  }

  test("q_sql_tpch_q10: returned-revenue top-20, independently recounted") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_sql_tpch_q10")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.forall(_ > 0) && revs.sameElements(revs.sortBy(-_)))
    // independent recount of the top customer's returned revenue
    val key = rows.head.getAs[Long]("c_custkey")
    val direct = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001),
        $"l_orderkey" === $"o_orderkey")
      .filter($"o_custkey" === key && $"l_returnflag" === "R" &&
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .agg(round(sum($"l_extendedprice".cast("decimal(14,2)") *
        (lit(BigDecimal(1)) - $"l_discount".cast("decimal(8,4)"))), 6)
        .cast("double")).head.getDouble(0)
    assert(math.abs(direct - rows.head.getAs[Double]("revenue")) < 1e-9)
  }

  test("q_agg_sample_estimate: exact side true, estimates x16-scaled and sane") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_agg_sample_estimate")(
      spark, sf0001).collect()
    assert(rows.nonEmpty)
    val directN = graft.Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("exact_n") === directN(flag))
      assert(r.getAs[Long]("est_n") % 16 === 0)
      // 1/16 hash sample of >=1000 rows per flag: rel err far below 50%
      assert(r.getAs[Double]("n_rel_err") < 0.5)
      assert(r.getAs[Double]("qty_rel_err") < 0.5)
    }
  }

  test("q_ml_neyman_sample: quotas match a driver-side Neyman allocation") {
    import spark.implicits._
    val moments = graft.Tables.documents(spark, sf0001)
      .groupBy($"lang").agg(count(lit(1)).as("n"),
        sum($"n_chars").as("sx"),
        sum($"n_chars" * $"n_chars").as("sxx")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val s = moments.map { case (lang, n, sx, sxx) =>
      lang -> (n, math.floor(math.sqrt((n * sxx - sx * sx).toDouble)).toLong)
    }.toMap
    val sTotal = s.values.map(_._2).sum
    val expected = s.map { case (lang, (n, sh)) =>
      lang -> math.min(n, math.max(1L, sh * 300 / sTotal))
    }
    val got = graft.SparkEntry.queries("q_ml_neyman_sample")(spark, sf0001)
      .select($"lang", $"quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected.filter { case (l, q) => q > 0 })
    // sampled rows really honor the quota
    val counts = graft.SparkEntry.queries("q_ml_neyman_sample")(spark, sf0001)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (l, c) => assert(c === expected(l)) }
  }

  test("q_ml_curriculum_order: contiguous per-bucket ranks, interleaved head") {
    val rows = graft.SparkEntry.queries("q_ml_curriculum_order")(
      spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val buckets = rows.groupBy(_._2)
    buckets.foreach { case (b, rs) =>
      val rks = rs.map(_._1).sorted
      assert(rks.head === 1 && rks.last === rks.length,
        s"bucket $b ranks not contiguous")
    }
    // round-robin: the first |buckets| rows cover every bucket once
    val head = rows.sortBy(r => (r._1, r._2)).take(buckets.size)
    assert(head.map(_._2).distinct.length === buckets.size)
    assert(head.forall(_._1 === 1))
  }

  test("q_simsearch_kmeans_portable matches a driver-side Lloyd replay") {
    import spark.implicits._
    // independent reimplementation: plain Scala over the collected
    // fixture (bounded: 500 x 64), exact integer arithmetic
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000.0).toLong)
          .toArray))
      .sortBy(_._1)
    def floorDiv(s: Long, n: Long): Long = { val r = ((s % n) + n) % n; (s - r) / n }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Seq[(Long, Array[Long])]) =
      vecs.map { case (id, qv) =>
        val (dist, cell) = cents.map { case (c, cv) => (d2(qv, cv), c) }.min
        (id, qv, cell, dist)
      }
    val seeds = vecs.filter(_._1 < 8).map { case (id, qv) => (id, qv) }.toSeq
    val a1 = assign(seeds)
    val c1 = a1.groupBy(_._3).map { case (cell, members) =>
      val n = members.length.toLong
      val dims = members.head._2.length
      (cell, Array.tabulate(dims)(d =>
        floorDiv(members.map(_._2(d)).sum, n)))
    }.toSeq.sortBy(_._1)
    val a2 = assign(c1)
    val expected = a2.groupBy(_._3).map { case (cell, ms) =>
      (cell, ms.length.toLong, ms.map(_._4).sum,
        c1.find(_._1 == cell).get._2.map(math.abs).sum)
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_simsearch_kmeans_portable")(
        spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got === expected)
  }
}
