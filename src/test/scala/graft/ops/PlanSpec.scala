package graft.ops

import graft.SparkTestBase

/** Physical-plan contracts: the plan SHAPES the 100 TB design depends on,
  * pinned as tests so they can't silently regress (SURVEY.md §2.3 scale
  * notes). String-matching executedPlan is deliberate — these are the
  * same signals a human reads in explain("formatted"). */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    // explain("formatted") text, not executedPlan.toString: the scan
    // node's one-line rendering truncates PushedFilters/ReadSchema
    val df = graft.SparkEntry.queries(name)(spark, sf0001)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("q_join_bloom_pruned applies the bloom filter on the fact scan, below the join") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec}
    val df = JoinOps.bloomPrunedJoin(spark, sf0001)
    val bloomFilters = df.queryExecution.sparkPlan.collect {
      case f: FilterExec if f.condition.toString.contains("UDF") &&
        f.collectLeaves().exists {
          case s: FileSourceScanExec =>
            s.relation.location.rootPaths.mkString(",").contains("lineitem")
          case _ => false
        } => f
    }
    // the might_contain UDF must sit directly over the lineitem scan —
    // pruning happens before any join/exchange touches the fact rows
    assert(bloomFilters.nonEmpty, df.queryExecution.sparkPlan.toString)
  }

  test("q_join_dpp_pruned carries a dynamicpruning PartitionFilter on the fact scan") {
    val p = plan("q_join_dpp_pruned")
    assert(p.contains("dynamicpruning"), p)
    assert(p.contains("PartitionFilters"), p)
  }

  test("q_scan_parquet prunes to the 4 projected columns") {
    val p = plan("q_scan_parquet")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_returnflag:string>"), p.take(2000))
  }

  test("q_agg_pricing_summary pushes the shipdate filter into the scan") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate,"), p.take(2000))
    assert(p.contains("HashAggregate"), "partial+final hash agg expected")
  }

  test("q_join_broadcast plans BroadcastHashJoin for both small dims") {
    val p = plan("q_join_broadcast")
    // formatted explain lists each node twice (tree + detail section)
    assert("BroadcastHashJoin".r.findAllIn(p).length == 4, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
  }

  test("q_join_bucketed_colocated has no shuffle between scan and join") {
    val p = plan("q_join_bucketed_colocated")
    assert(p.contains("SortMergeJoin"), p.take(2000))
    // the only exchange allowed is the post-agg/sort one ABOVE the join;
    // below the SMJ the bucketed scans must feed it directly
    val joinIdx = p.indexOf("SortMergeJoin")
    val below = p.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      "bucketed sides must not re-shuffle: " + below.take(1500))
  }

  test("q_sort_topk plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_text_pii_redact is a narrow map: no hash-partition exchange") {
    val p = plan("q_text_pii_redact")
    // the only exchange allowed is the final presentation sort's range
    // partitioning — redaction itself must not shuffle
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("q_text_tfidf carries the corpus count as a broadcast, not a second job") {
    val p = plan("q_text_tfidf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "corpus count must join in-plan as a broadcast: " + p.take(2000))
  }

  test("q_sort_topk_per_key plans partial+final heap passes around one exchange") {
    val p = plan("q_sort_topk_per_key")
    val hits = "TopKPerKey".r.findAllIn(p).length
    assert(hits >= 2, s"expected partial+final TopKPerKeyExec, got $hits:\n" +
      p.take(2000))
  }

  test("q_ml_quota_sample plans as bounded per-key top-k heaps, not a full sort") {
    // the docstring's scale claim, pinned: quota selection rewrites to
    // the two-phase TopKPerKeyExec (a hot language buffers k rows, not
    // its corpus share)
    val p = plan("q_ml_quota_sample")
    val hits = "TopKPerKey".r.findAllIn(p).length
    assert(hits >= 2, s"expected partial+final TopKPerKeyExec, got $hits:\n" +
      p.take(2000))
  }

  test("q_ml_temperature_mix's budget-cap window plans as bounded per-key heaps") {
    // the docstring's scale claim: the constant rk <= 200 cut sits
    // directly on the window, so RewriteTopKWindow must produce the
    // partial+final TopKPerKeyExec pair — a hot language buffers 200
    // rows, never its corpus share
    val p = plan("q_ml_temperature_mix")
    val hits = "TopKPerKey".r.findAllIn(p).length
    assert(hits >= 2, s"expected partial+final TopKPerKeyExec, got $hits:\n" +
      p.take(2000))
  }

  test("q_ml_domain_mix's budget-cap window plans as bounded per-key heaps") {
    // same scale contract as temperature mix: the constant rk <= 400 cut
    // on the window must lower to the partial+final TopKPerKeyExec pair
    val p = plan("q_ml_domain_mix")
    val hits = "TopKPerKey".r.findAllIn(p).length
    assert(hits >= 2, s"expected partial+final TopKPerKeyExec, got $hits:\n" +
      p.take(2000))
  }

  test("q_simsearch_topk_ivf reads only probed cells via partition pruning") {
    // the IVF scale claim made literal (round 7): the corpus lives
    // cell-PARTITIONED in the persisted index, and the query's scan must
    // carry the probed-cell INSET as a PartitionFilter — a refactor that
    // reintroduces a full-corpus scan + join on cell would read
    // nlist/nprobe times more bytes at 100 TB
    val p = plan("q_simsearch_topk_ivf")
    assert(p.contains("PartitionFilters: [cell"),
      s"cells scan not partition-pruned:\n${p.take(3000)}")
    assert(p.contains("INSET"),
      s"probed-cell INSET missing from partition filters:\n${p.take(3000)}")
  }

  test("ANN candidate and re-rank windows plan as bounded per-key heaps") {
    // every ANN variant selects candidates and/or re-ranks them with a
    // row_number()<=k window per query id; RewriteTopKWindow must turn
    // each into the two-phase TopKPerKeyExec — a refactor to a window
    // shape the rule can't match (extra window columns, rank() instead
    // of row_number) would silently reintroduce a full per-query sort
    // of the candidate set at corpus scale. brute/LSH have one window
    // (the re-rank); IVF/PQ have two (NCAND cut + re-rank).
    for ((q, minWindows) <- Seq(
        "q_simsearch_topk" -> 1, "q_simsearch_topk_lsh" -> 1,
        "q_simsearch_topk_ivf" -> 2, "q_simsearch_topk_pq" -> 2)) {
      val p = plan(q)
      val hits = "TopKPerKey".r.findAllIn(p).length
      // formatted explain renders each node twice (tree + details), and
      // each logical top-k plans as a partial+final pair
      assert(hits >= 2 * minWindows,
        s"$q: expected >=$minWindows TopKPerKeyExec pairs, saw $hits:\n" +
          p.take(2000))
    }
  }

  test("q_filter_compound pushes even the OR-disjunction into the scan") {
    val p = plan("q_filter_compound")
    assert(p.contains("Or(LessThan(l_quantity,10.0),EqualTo(l_returnflag,R))"),
      p.take(2000))
  }

  test("q_sql_tpch_q3 plans a heap top-10, never a global sort") {
    val p = plan("q_sql_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // revenue filters pushed to each leg's scan
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), " +
      "EqualTo(c_mktsegment,BUILDING)"), p.take(4000))
    assert(p.contains("GreaterThan(l_shipdate,"), p.take(4000))
  }

  test("q_sql_recursive_cte actually executes through UnionLoop") {
    val df = graft.SparkEntry.queries("q_sql_recursive_cte")(spark, sf0001)
    val s = df.queryExecution.optimizedPlan.toString
    assert(s.contains("UnionLoop"), s.take(2000))
  }

  test("q_quality_outlier_iqr broadcasts the fence table back onto the scan") {
    val p = plan("q_quality_outlier_iqr")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }
}
