package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.to_date

/** Round-12 wave: repo-side evidence for the new operators —
  * independent driver-side replays in plain Scala over the bounded
  * sf0.001 fixture (never a rerun of the query's own expressions),
  * plus plan pins for the topologies the 100 TB story depends on and
  * unit pins for the new native Jaro-Winkler expression. */
class Wave12Spec extends SparkTestBase {

  test("round-12 plan pins: the 100 TB topologies are what the scaladocs claim") {
    // DSIR's global top-100 must be TakeOrderedAndProject (partial
    // heaps), NOT a keyless row_number window over the corpus frame
    val dsir = graft.SparkEntry.queries("q_ml_dsir_select")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(dsir.contains("TakeOrderedAndProject"), dsir.take(1500))
    // prefix filtering joins on shingles only — never a cartesian
    val pf = graft.SparkEntry.queries("q_dedup_prefix_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!pf.contains("CartesianProduct"), pf.take(1500))
    // zipf's rank window runs AFTER the distributed top-1000 cut
    val zipf = graft.SparkEntry.queries("q_text_zipf_fit")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(zipf.contains("TakeOrderedAndProject"), zipf.take(1500))
    // weighted median: the running sum is partitioned by (flag, bucket)
    // — the two-level decomposition, not a keyless per-flag window
    val wm = graft.SparkEntry.queries("q_agg_weighted_median")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the corpus-facing running sum must partition by BOTH f and bkt —
    // pin the window spec itself (a bare "windowspecdefinition"
    // substring is vacuous: every plan with any window prints one)
    val bucketedSpec = """windowspecdefinition\(f#\d+, bkt#\d+L""".r
    assert(bucketedSpec.findFirstIn(wm).isDefined,
      "no (f, bkt)-partitioned window spec: " + wm.take(1500))
  }

  test("jaro_winkler: classic-Winkler convention pins") {
    val jw = graft.plans.JaroWinklerExpression.jw _
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    // boost SUPPRESSED below the 0.7 jaro threshold despite the
    // 3-char common prefix (the DuckDB-pinned convention)
    assert(jw("abcxxx", "abcyyyzz") === 0.625)
    assert(jw("same", "same") === 1.0)
    assert(jw("", "x") === 0.0)
    assert(jw("order", "sort") === 0.6333333333333333)
  }

  test("q_text_fuzzy_entity: dictionary-sized join, no cartesian") {
    val df = graft.SparkEntry.queries("q_text_fuzzy_entity")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every surviving pair shares its first char and clears 0.85
    rows.foreach { r =>
      assert(r.getString(0).head === r.getString(1).head)
      assert(r.getDouble(2) >= 0.85)
    }
  }

  test("q_dedup_prefix_filter: equals an all-pairs Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_dedup_prefix_filter")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // replay: all-pairs distinct 5-gram jaccard >= 0.5, no filter
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val sh = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> (if (w.length < 5) Set.empty[String]
             else w.sliding(5).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val expected = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = (sa & sb).size if 3 * inter >= sa.size + sb.size
    } yield (a, b, inter.toLong)).toSet
    assert(expected.nonEmpty, "vacuous: no pairs at sf0.001")
    assert(got === expected)
  }

  test("q_simsearch_sq8: equals an int8-quantized Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_simsearch_sq8")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.max(-127L, math.min(127L, math.floor(x.toDouble * 127.0).toLong)))
          .toArray)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expected = vecs.filter(_._1 < 10).sortBy(_._1).flatMap { case (q, qv) =>
      val qn = math.sqrt(dot(qv, qv).toDouble)
      vecs.filter(_._1 != q)
        .map { case (c, cv) =>
          val s = BigDecimal(dot(qv, cv).toDouble /
            (qn * math.sqrt(dot(cv, cv).toDouble)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (c, s)
        }
        .sortBy { case (c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((c, _), i) => (q, i + 1, c) }
    }.toSeq
    assert(got === expected)
  }

  test("q_simsearch_coreset_kcenter: equals a greedy Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_simsearch_coreset_kcenter")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000.0).toLong)
          .toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector(vecs.head._2)
    var expected = Vector((1, vecs.head._1, 0L))
    for (r <- 2 to 8) {
      val (id, _, d) = vecs
        .map { case (id, v) => (id, v, chosen.map(c => d2(v, c)).min) }
        .minBy { case (id, _, d) => (-d, id) }
      expected :+= ((r, id, d))
      chosen :+= vecs.find(_._1 == id).get._2
    }
    assert(got === expected)
  }

  test("q_ml_bootstrap_ci: equals a Poisson-weight Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_ml_bootstrap_ci")(spark, sf0001)
    val r0 = df.collect()(0)
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2)))
    val th = Seq(367879443L, 735758887L, 919698609L, 981011849L,
      996340160L, 999405822L)
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    val means = (0L until 100L).map { r =>
      var sw = 0L; var sp = BigDecimal(0)
      orders.foreach { case (k, p) =>
        val h = ((k % 1000000007L) * 2654435761L + r * 97003L) % 1000000007L
        val w = th.count(h >= _).toLong // = |{t : h >= t}| = weight
        sw += w; sp += p * w
      }
      (micro(sp.toDouble / sw.toDouble), r)
    }.sorted
    assert(r0.getLong(0) === orders.length.toLong)
    assert(r0.getDouble(1) ===
      micro(orders.map(_._2).sum.toDouble / orders.length))
    assert(r0.getLong(2) === 100L)
    assert(r0.getDouble(3) === means(2)._1)  // rank 3
    assert(r0.getDouble(4) === means(97)._1) // rank 98
  }

  test("q_window_ewma: equals a per-customer Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_window_ewma")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val orders = graft.Tables.orders(spark, sf0001)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getDouble(3)))
    assert(got.size === orders.length)
    orders.groupBy(_._1).foreach { case (ck, rows) =>
      // ISO LocalDateTime strings sort chronologically (4-digit years)
      val hist = rows.sortBy(r => (r._3.toString, r._2)).map(r => (r._2, r._4))
      hist.indices.foreach { t =>
        val m = math.min(t + 1, 16)
        val wsum = (0 until m).map(i =>
          hist(t - i)._2 * (1L << (15 - i)).toDouble).sum
        val denom = 65536.0 - math.pow(2.0, 16 - m)
        val exp = math.floor(wsum / denom * 1e6) / 1e6
        assert(got((ck, hist(t)._1)) === exp,
          s"cust $ck order ${hist(t)._1}")
      }
    }
  }

  test("q_simsearch_mmr: equals a greedy MMR Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_simsearch_mmr")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000.0).toLong)
          .toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qv = vecs(0L)
    val rel = vecs.filter(_._1 != 0L)
      .map { case (id, v) => id -> dot(qv, v) }
    var chosen = Vector.empty[Long]
    var expected = Vector.empty[(Int, Long, Long, Long)]
    for (r <- 1 to 5) {
      val (id, m) = rel.filter(p => !chosen.contains(p._1))
        .map { case (id, rl) =>
          val pen = if (chosen.isEmpty) 0L
            else chosen.map(s => dot(vecs(id), vecs(s))).max
          id -> (if (chosen.isEmpty) rl else rl - pen)
        }
        .minBy { case (id, m) => (-m, id) }
      expected :+= ((r, id, rel(id), m))
      chosen :+= id
    }
    assert(got === expected)
  }

  test("q_agg_weighted_median: equals a cumulative-weight Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_agg_weighted_median")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))
    val expected = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rows) =>
      val byPrice = rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (x, rs) => (x, rs.map(_._3).sum) }
      val wtot = byPrice.map(_._2).sum
      def pick(num: Long, den: Long): Double = {
        var cum = 0L
        byPrice.find { case (_, w) => cum += w; cum * den >= wtot * num }
          .get._1
      }
      (f, wtot, pick(1, 2), pick(9, 10))
    }
    assert(got === expected)
  }

  test("q_quality_winsorize: equals an order-statistic Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_quality_winsorize")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (l, rs) =>
      val v = rs.map(_._2).sorted
      val n = v.length
      val lo = v(math.ceil(0.05 * n).toInt - 1)
      val hi = v(math.ceil(0.95 * n).toInt - 1)
      val wins = v.map(x => math.max(lo, math.min(hi, x)))
      (l, n.toLong, lo, hi,
        micro(v.sum.toDouble / n), micro(wins.sum.toDouble / n))
    }
    assert(got === expected)
  }

  test("q_quality_mutual_info: equals a contingency-table Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_quality_mutual_info")(spark, sf0001)
    val r0 = df.collect()(0)
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cl = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cs = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val n = docs.length.toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    val mi = micro(cells.map { case ((l, s), c) =>
      r6(math.log((c.toDouble * n.toDouble) /
        (cl(l).toDouble * cs(s).toDouble))) * c }.sum.toDouble / n)
    val hl = micro(-cl.values.map(c =>
      r6(math.log(c.toDouble / n.toDouble)) * c).sum.toDouble / n)
    val hs = micro(-cs.values.map(c =>
      r6(math.log(c.toDouble / n.toDouble)) * c).sum.toDouble / n)
    assert((r0.getLong(0), r0.getLong(1), r0.getDouble(2), r0.getDouble(3),
      r0.getDouble(4)) === ((n, cells.size.toLong, mi, hl, hs)))
  }

  test("q_quality_ks_test: equals a cdf-scan Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_quality_ks_test")(spark, sf0001)
    val r0 = df.collect()(0)
    val docs = graft.Tables.documents(spark, sf0001)
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val s0 = docs.filter(_._1 == "src0").map(_._2)
    val s1 = docs.filter(_._1 == "src1").map(_._2)
    val domain = (s0 ++ s1).distinct.sorted
    val (n0, n1) = (s0.length.toLong, s1.length.toLong)
    val (dNum, vAt) = domain.map { v =>
      (math.abs(s0.count(_ <= v) * n1 - s1.count(_ <= v) * n0), v)
    }.minBy { case (d, v) => (-d, v) }
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getLong(3)) ===
      ((n0, n1, dNum, vAt)))
    assert(r0.getDouble(4) === BigDecimal(dNum.toDouble / (n0 * n1).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(dNum > 0L)
  }

  test("q_quality_cramers_v: equals a chi-squared Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_quality_cramers_v")(spark, sf0001)
    val r0 = df.collect()(0)
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"lang", $"source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cl = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cs = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val n = docs.length.toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val term = cells.map { case ((l, s), c) =>
      val d = (c * n - cl(l) * cs(s)).toDouble
      r6(d * d / (cl(l).toDouble * cs(s).toDouble * n.toDouble))
    }.sum
    val e = cells.map { case ((l, s), _) =>
      r6(cl(l).toDouble * cs(s).toDouble / n.toDouble) }.sum
    val chi2Adj = math.floor((term - e).toDouble * 1e6) / 1e6 + n
    val v = math.floor(math.sqrt(chi2Adj /
      (n * (math.min(cl.size, cs.size) - 1)).toDouble) * 1e6) / 1e6
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2)) ===
      ((n, cl.size.toLong, cs.size.toLong)))
    assert(r0.getDouble(3) === chi2Adj)
    assert(r0.getDouble(4) === v)
  }

  test("q_ml_learning_curve: fractions nest and match a Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_ml_learning_curve")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val subsets = (1L to 10L).map { f =>
      f -> docs.filter { case (id, _) =>
        (((id % 1000000007L) * 2654435761L + 41L) % 1000000007L) * 10L <
          f * 1000000007L }
    }
    val expected = subsets.map { case (f, d) =>
      (f, d.length.toLong, d.map(_._2).sum) }
    assert(got === expected)
    // the defining property: every fraction contains the previous one
    subsets.map(_._2.map(_._1).toSet).sliding(2).foreach {
      case Seq(a, b) => assert(a.subsetOf(b), "fractions must nest")
    }
    assert(got.map(_._2).distinct.length > 1, "all fractions equal (vacuous)")
  }

  test("q_window_cusum: equals a sequential max(0, .) Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_window_cusum")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq
    // replay with the TEXTBOOK sequential recursion (not the prefix
    // decomposition the query uses) — equality proves the identity
    // S_t = P_t - min P_j
    val daily = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").as("d"), $"o_totalprice").collect()
      .map(r => (r.getDate(0).toString,
        (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val n = daily.length.toLong
    val s = daily.map(_._2).sum
    var st = 0L
    val expected = daily.map { case (d, rev) =>
      st = math.max(0L, st + (n * rev - s)) // scaled: k folded into dev
      (d, rev, math.floor(st.toDouble / n / 100.0 * 1e6) / 1e6,
        if (st > 2 * s) 1 else 0)
    }
    assert(got === expected)
    assert(got.map(_._4).distinct.length == 2, "flag vacuous")
  }

  test("q_agg_ohlc: equals a first/last-pick Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_agg_ohlc")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    val ev = graft.Tables.events(spark, sf0001)
      .select(to_date($"ts").as("d"), $"ts", $"event_id", $"value").collect()
      .map(r => (r.getDate(0).toString, r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getDouble(3)))
    val expected = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      (d, sorted.head._4, rs.map(_._4).max, rs.map(_._4).min,
        sorted.last._4, rs.length.toLong)
    }
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) === expected)
  }

  test("q_sort_skyline: equals a pairwise-dominance Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_sort_skyline")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getLong(2))).toSeq
    val pts = graft.Tables.part(spark, sf0001)
      .select($"p_retailprice", $"p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
      .toSeq
    // brute-force dominance (the definition, not the sweep)
    val expected = pts.filter { case (p, s, _) =>
      !pts.exists { case (p2, s2, _) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.sortBy(_._1)
    assert(got === expected)
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("q_join_asof_nearest: equals a brute-force nearest Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_join_asof_nearest")(spark, sf0001)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val ev = graft.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type",
        org.apache.spark.sql.functions.unix_millis($"ts").as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purch = ev.filter(_._3 == "purchase")
    val expected = ev.filter(_._3 == "error").sortBy(_._1).map {
      case (eid, u, _, ems) =>
        val cands = purch.filter(p => p._2 == u &&
          math.abs(p._4 - ems) <= 86400000L)
        if (cands.isEmpty) (eid, u, None, None)
        else {
          val b = cands.minBy(p => (math.abs(p._4 - ems), p._1))
          (eid, u, Some(b._1), Some(b._4 - ems))
        }
    }.toSeq
    assert(got === expected)
    assert(expected.exists(_._3.isDefined) && expected.exists(_._3.isEmpty),
      "nearest-asof vacuous (all or none matched)")
  }

  test("q_window_drawdown: equals a running-peak Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_window_drawdown")(spark, sf0001)
    val got = df.collect().map(r => (r.getDate(0).toString, r.getLong(1),
      r.getLong(2), r.getLong(3), r.getInt(4))).toSeq
    val daily = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").as("d"), $"o_totalprice").collect()
      .map(r => (r.getDate(0).toString,
        (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    var peak = Long.MinValue
    val expected = daily.map { case (d, rev) =>
      peak = math.max(peak, rev)
      (d, rev, peak, peak - rev, if (rev == peak) 1 else 0)
    }
    assert(got === expected)
    assert(got.map(_._5).distinct.length == 2, "peak flag vacuous")
  }

  test("q_text_concordance: equals a sliding-context Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_text_concordance")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSeq
    val expected = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        toks.zipWithIndex.collect { case ("spark", i) =>
          (r.getLong(0), i + 1,
            toks.slice(math.max(0, i - 3), i).mkString(" "),
            toks.slice(i + 1, math.min(toks.length, i + 4)).mkString(" "))
        }
      }.sortBy(t => (t._1, t._2)).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q_agg_ratio_delta_ci: equals a moments Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_agg_ratio_delta_ci")(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2),
        BigDecimal(r.getDouble(2)).setScale(2)))
    val expected = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rs) =>
      val n = rs.length
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxx = rs.map(t => t._2 * t._2).sum
      val syy = rs.map(t => t._3 * t._3).sum
      val sxy = rs.map(t => t._2 * t._3).sum
      val r = sy.toDouble / sx.toDouble
      val xb = sx.toDouble / n
      def cov(sab: BigDecimal, sa: BigDecimal, sb: BigDecimal) =
        (sab.toDouble - sa.toDouble * sb.toDouble / n) / (n - 1)
      val se = math.sqrt((cov(syy, sy, sy) - 2.0 * r * cov(sxy, sx, sy) +
        r * r * cov(sxx, sx, sx)) / (n * xb * xb))
      (f, n.toLong, micro(r), micro(se),
        micro(r - 1.96 * se), micro(r + 1.96 * se))
    }
    assert(got === expected)
  }

  test("q_agg_ols_fit: equals a normal-equations Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_agg_ols_fit")(spark, sf0001)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSeq
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    val li = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice").collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2),
        BigDecimal(r.getDouble(2)).setScale(2)))
    val expected = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, rs) =>
      val n = rs.length
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxx = rs.map(t => t._2 * t._2).sum
      val syy = rs.map(t => t._3 * t._3).sum
      val sxy = rs.map(t => t._2 * t._3).sum
      val vxx = sxx.toDouble - sx.toDouble * sx.toDouble / n
      val vyy = syy.toDouble - sy.toDouble * sy.toDouble / n
      val vxy = sxy.toDouble - sx.toDouble * sy.toDouble / n
      val slope = vxy / vxx
      (f, n.toLong, micro(slope),
        micro((sy.toDouble - slope * sx.toDouble) / n),
        micro(vxy * vxy / (vxx * vyy)))
    }
    assert(got === expected)
  }

  test("q_window_acf: equals a centered-moments Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_window_acf")(spark, sf0001)
    val r0 = df.collect()(0)
    val daily = graft.Tables.orders(spark, sf0001)
      .select(to_date($"o_orderdate").as("d"), $"o_totalprice").collect()
      .map(r => (r.getDate(0).toString,
        (BigDecimal(r.getDouble(1)).setScale(2) * 100).toLongExact))
      .groupBy(_._1).map { case (d, rs) => d -> rs.map(_._2).sum }
      .toSeq.sortBy(_._1).map(_._2)
    val n = daily.length
    val s = daily.sum
    val u = daily.map(x => BigDecimal(n.toLong * x - s))
    val den = u.map(v => v * v).sum
    assert(r0.getLong(0) === n.toLong)
    (1 to 7).foreach { k =>
      val num = (k until n).map(t => u(t) * u(t - k)).sum
      val exp = math.floor(num.toDouble / den.toDouble * 1e6) / 1e6
      assert(r0.getDouble(k) === exp, s"acf_$k")
    }
  }

  test("q_quality_welch_ttest: equals a moments Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_quality_welch_ttest")(spark, sf0001)
    val r0 = df.collect()(0)
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    val docs = graft.Tables.documents(spark, sf0001)
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def mom(src: String) = {
      val v = docs.filter(_._1 == src).map(_._2)
      val n = v.length
      val m = v.sum.toDouble / n
      (n, m, (v.map(x => x * x).sum.toDouble -
        v.sum.toDouble * v.sum.toDouble / n) / (n - 1))
    }
    val (n0, m0, v0) = mom("src0"); val (n1, m1, v1) = mom("src1")
    val se2 = v0 / n0 + v1 / n1
    val t = (m0 - m1) / math.sqrt(se2)
    val dfw = se2 * se2 / ((v0 / n0) * (v0 / n0) / (n0 - 1) +
      (v1 / n1) * (v1 / n1) / (n1 - 1))
    assert((r0.getLong(0), r0.getLong(1)) === ((n0.toLong, n1.toLong)))
    assert(r0.getDouble(2) === micro(m0))
    assert(r0.getDouble(3) === micro(m1))
    assert(r0.getDouble(4) === micro(t))
    assert(r0.getDouble(5) === micro(dfw))
  }

  test("q_text_zipf_fit: equals a log-log OLS Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_text_zipf_fit")(spark, sf0001)
    val r0 = df.collect()(0)
    def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val freq = graft.Tables.documents(spark, sf0001)
      .select($"text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (t, v) => (t, v.length.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    val pts = freq.zipWithIndex.map { case ((_, c), i) =>
      (r6(math.log((i + 1).toDouble)), r6(math.log(c.toDouble))) }
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val vxx = sxx.toDouble - sx.toDouble * sx.toDouble / n
    val vyy = syy.toDouble - sy.toDouble * sy.toDouble / n
    val vxy = sxy.toDouble - sx.toDouble * sy.toDouble / n
    val slope = vxy / vxx
    assert(r0.getLong(0) === n.toLong)
    assert(r0.getDouble(1) === micro(slope))
    assert(r0.getDouble(2) === micro((sy.toDouble - slope * sx.toDouble) / n))
    assert(r0.getDouble(3) === micro(vxy * vxy / (vxx * vyy)))
    assert(r0.getDouble(1) < 0.0, "zipf slope must be negative")
  }

  test("q_ml_dsir_select: weights match a Scala replay") {
    import spark.implicits._
    val df = graft.SparkEntry.queries("q_ml_dsir_select")(spark, sf0001)
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(4))).toSeq
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tgtSrc = (0 until 5).map(i => s"src$i").toSet
    val toks = docs.map { case (id, s, t) =>
      (id, tgtSrc(s), t.split(" ", -1).toSeq) }
    val cnt = collection.mutable.Map[String, (Long, Long)]()
    toks.foreach { case (_, tgt, ts) => ts.foreach { t =>
      val (a, b) = cnt.getOrElse(t, (0L, 0L))
      cnt(t) = if (tgt) (a + 1, b) else (a, b + 1)
    }}
    val nT = cnt.values.map(_._1).sum
    val nR = cnt.values.map(_._2).sum
    val v = cnt.size.toLong
    val lam = cnt.map { case (t, (ct, cr)) =>
      t -> BigDecimal(math.log(
        ((ct + 1).toDouble / (nT + v).toDouble) /
        ((cr + 1).toDouble / (nR + v).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = toks.filter(!_._2)
      .map { case (id, _, ts) => (id, ts.map(lam).sum) }
      .sortBy { case (id, w) => (-w, id) }.take(100).zipWithIndex
      .map { case ((id, w), i) =>
        (i + 1, id, (w * 1000000).toBigInt.toLong) }.toSeq
    assert(got === expected)
  }
}
