package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The `spark.sql(...)` entry point + typed Dataset[T] surface
  * (SURVEY.md §1.3: DataFrame for dynamic schemas, Dataset[T] where type
  * safety helps).
  */
object SqlOps extends graft.QueryModule {

  /** GROUPING SETS through the SQL front end over registered temp views —
    * the full text-to-plan path (parser -> analyzer -> optimizer), not
    * just the DataFrame DSL. */
  def groupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 6) AS DOUBLE)
        |    AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** LATERAL correlated subquery (SQL:1999, Spark 3.2+): per outer row,
    * a dependent subquery with its own ORDER BY/LIMIT — the SQL-text
    * spelling of top-k-per-group. Catalyst decorrelates it into a
    * window/join plan, so the lateral is planning sugar, not a
    * nested-loop execution. */
  def lateralTopPerRegion(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.region(spark, sfDir).createOrReplaceTempView("region_v")
    graft.Tables.nation(spark, sfDir).createOrReplaceTempView("nation_v")
    graft.Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier_v")
    spark.sql(
      """SELECT r.r_name, t.n_name, t.n_suppliers
        |FROM region_v r,
        |LATERAL (
        |  SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
        |  FROM nation_v n JOIN supplier_v s ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_suppliers DESC, n.n_name
        |  LIMIT 2
        |) t
        |ORDER BY r.r_name, t.n_suppliers DESC, t.n_name""".stripMargin)
  }

  /** SQL-text PIVOT (parser surface; the DSL pivot is q_reshape_pivot):
    * pinned IN-list, so no distinct-values pre-job. */
  def sqlPivot(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus,
        |  coalesce(urgent, 0L) AS urgent, coalesce(medium, 0L) AS medium,
        |  coalesce(low, 0L) AS low
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority FROM orders_v)
        |PIVOT (COUNT(*) FOR o_orderpriority IN
        |  ('1-URGENT' AS urgent, '3-MEDIUM' AS medium, '5-LOW' AS low))
        |ORDER BY o_orderstatus""".stripMargin)
  }

  /** Deterministic string aggregation: per group, the DISTINCT values
    * joined in sorted order — collect_set is unordered by contract, so
    * array_sort pins the one canonical rendering both engines agree on. */
  def stringAgg(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"),
        size(collect_set(col("o_orderpriority"))).cast("long")
          .as("n_distinct"))
      .orderBy(col("o_orderstatus"))

  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
                            o_orderstatus: String, o_totalprice: Double)
  final case class StatusSpend(status: String, spend_bucket: String)

  /** Typed Dataset ops: case-class Encoder, typed filter/map, then back to
    * the relational surface for the aggregate (keeps codegen'd agg). */
  def typedDataset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders: Dataset[OrderRow] = graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .as[OrderRow]
    orders
      .filter(o => o.o_totalprice > 1000.0)
      .map(o => StatusSpend(o.o_orderstatus,
        if (o.o_totalprice >= 200000.0) "high"
        else if (o.o_totalprice >= 50000.0) "mid" else "low"))
      .groupBy($"status", $"spend_bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"status", $"spend_bucket")
  }

  /** Uncorrelated scalar subquery in a predicate. max() is exact (no
    * summation order), and the 20x scaling is a single correctly-rounded
    * double multiply — identical threshold on both engines. */
  def scalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    graft.Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders_v
        |WHERE o_totalprice > 20 * (SELECT max(c_acctbal) FROM customer_v)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** IN (subquery) predicate — planned as a left-semi join. */
  def inSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    graft.Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey FROM orders_v
        |WHERE o_custkey IN (SELECT c_custkey FROM customer_v
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Multi-CTE pipeline: per-customer totals re-aggregated per segment.
    * Decimal sums all the way; one text works verbatim in both engines
    * (the oracle reuses it with the _v suffixes stripped). */
  private def cteSql(orders: String, customer: String): String =
    s"""WITH tot AS (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |    SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS spend
       |  FROM $orders GROUP BY o_custkey)
       |SELECT c_mktsegment, COUNT(*) AS n_cust,
       |  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       |  CAST(SUM(spend) AS DOUBLE) AS total_spend
       |FROM $customer JOIN tot ON c_custkey = o_custkey
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  def cte(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    graft.Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(cteSql("orders_v", "customer_v"))
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into an outer
    * aggregate join; the COALESCE pins customers with no orders to 0 on
    * both engines. */
  def correlatedSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    graft.Tables.customer(spark, sfDir).createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT c_custkey,
        |  COALESCE((SELECT COUNT(*) FROM orders_v
        |            WHERE o_custkey = c_custkey), 0) AS n_orders
        |FROM customer_v ORDER BY c_custkey""".stripMargin)
  }

  /** WITH RECURSIVE through Spark 4's UnionLoop operator (SPARK-24497):
    * a month calendar generated by recursion from the orders date range,
    * then LEFT JOINed back so empty months surface as zero rows — the
    * canonical gap-fill that a non-recursive GROUP BY cannot produce.
    * The recursion depth is the number of distinct months (bounded by
    * the data's date span, ~80 here), NOT the row count, so each
    * iteration is a single-row step and the subsequent join is an
    * ordinary shuffle join at any scale. The max/min bounds ride along
    * inside the loop row to keep the recursive leg subquery-free.
    * (Iterative self-join algorithms with data-sized recursion depth —
    * e.g. connected components — stay on the label-propagation path in
    * DedupOps: recursion depth there would be the graph diameter per
    * UnionLoop iteration over the FULL edge set, which does not scale.) */
  def recursiveCalendar(spark: SparkSession, sfDir: String): DataFrame = {
    // the depth equals the data's month span (~80 on the fixture), which
    // sits just under Spark's default cteRecursionLevelLimit of 100 — a
    // wider date span would hard-fail while the DuckDB oracle still
    // succeeds. 10k months = 800 years of data: effectively unbounded
    // for a calendar recursion, still a loud stop on a runaway loop.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "10000")
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql(
      """WITH RECURSIVE months AS (
        |  (SELECT trunc(CAST(min(o_orderdate) AS DATE), 'MM') AS m,
        |          trunc(CAST(max(o_orderdate) AS DATE), 'MM') AS hi
        |   FROM orders_v)
        |  UNION ALL
        |  SELECT add_months(m, 1), hi FROM months WHERE m < hi
        |)
        |SELECT m AS month_start, COUNT(o_orderkey) AS n_orders,
        |  CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0),
        |       2) AS DOUBLE) AS total
        |FROM months LEFT JOIN orders_v
        |  ON trunc(CAST(o_orderdate AS DATE), 'MM') = m
        |GROUP BY m ORDER BY m""".stripMargin)
  }

  /** q_sql_tpch_q3 — the TPC-H Q3 shape (shipping-priority top-10):
    * the flagship 3-table star join customer⋈orders⋈lineitem with
    * filters on all three legs, decimal-exact revenue, and a
    * revenue-ranked top-10. The plan-quality showcase: each filter
    * pushes to its own scan (ReadSchema carries only the 7 used
    * columns of 22), the segment-filtered customer side falls under
    * the AQE broadcast threshold at fixture scale (and shuffles
    * cleanly when it wouldn't at 100 TB — nothing here pins a
    * broadcast), and orderBy+limit plans as TakeOrderedAndProject —
    * a bounded heap, never a global sort. Revenue follows the
    * pricing-summary decimal discipline (exact DECIMAL sum, one
    * round-6, then double). */
  def tpchQ3(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("1998-01-01").cast("timestamp")
    val cust = graft.Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = graft.Tables.orders(spark, sfDir)
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    ord.join(cust, $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate".cast("date").as("o_orderdate"))
      .agg(round(sum(AggOps.dec($"l_extendedprice") *
          (lit(BigDecimal(1)) - AggOps.rate($"l_discount"))), 6)
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** q_sql_tpch_q5 — the TPC-H Q5 shape (local-supplier volume): the
    * 6-table snowflake customer⋈orders⋈lineitem⋈supplier⋈nation⋈region
    * with the EXTRA non-hierarchical equi-edge c_nationkey = s_nationkey
    * ("customer and supplier in the same nation") that makes Q5 the
    * classic join-ORDER stressor. Declared join order is big-to-small
    * (fact legs first, dims last) so the two dim joins ride the
    * already-shuffled fact stream as broadcasts; at 100 TB the
    * orders⋈lineitem leg shuffles on orderkey once, supplier (smaller
    * by 100x) broadcasts or shuffles on suppkey, and nation/region are
    * always broadcast — the plan has exactly ONE big shuffle pair.
    * The region filter reaches the region scan and AQE/DPP prunes from
    * there. Revenue keeps the decimal discipline of [[tpchQ3]]. */
  def tpchQ5(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val ord = graft.Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
      .select($"o_orderkey", $"o_custkey")
    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    val cust = graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey")
    val supp = graft.Tables.supplier(spark, sfDir)
      .select($"s_suppkey", $"s_nationkey")
    val nat = graft.Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name", $"n_regionkey")
    val reg = graft.Tables.region(spark, sfDir)
      .filter($"r_name" === "ASIA").select($"r_regionkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum(AggOps.dec($"l_extendedprice") *
          (lit(BigDecimal(1)) - AggOps.rate($"l_discount"))), 6)
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** q_sql_tpch_q18 — the TPC-H Q18 shape (large-volume customers): a
    * HAVING-filtered self-aggregate of the fact table semijoin-pruning
    * the same fact table. The scale shape: the inner groupBy is ONE
    * partial-agg'd shuffle on orderkey producing a tiny key set (46 of
    * 15k orders at the fixture threshold), which then SEMI-joins — not
    * IN-materializes — back against orders/lineitem on the same key,
    * so AQE turns it into a broadcast semi at any realistic
    * selectivity; the final per-order quantity rollup reuses the
    * orderkey partitioning. Quantities sum as DECIMAL(14,2) (the
    * fixture's l_quantity is integral but typed double), total ordered
    * by o_totalprice desc with the orderkey tiebreak, top-100 as a
    * TakeOrderedAndProject heap. */
  def tpchQ18(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity")
    val big = li.groupBy($"l_orderkey")
      .agg(sum(AggOps.dec($"l_quantity")).as("qty"))
      .filter($"qty" > 300).select($"l_orderkey".as("big_orderkey"))
    val ord = graft.Tables.orders(spark, sfDir)
      .join(big, $"o_orderkey" === $"big_orderkey", "left_semi")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    val cust = graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name")
    ord.join(cust, $"o_custkey" === $"c_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"c_name", $"c_custkey", $"o_orderkey",
        $"o_orderdate".cast("date").as("o_orderdate"),
        round(AggOps.dec($"o_totalprice"), 6).cast("double")
          .as("o_totalprice"))
      .agg(round(sum(AggOps.dec($"l_quantity")), 6).cast("double")
        .as("total_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** q_sql_tpch_q10 — the TPC-H Q10 shape (returned-item reporting):
    * customer⋈orders⋈lineitem⋈nation with a one-quarter order window
    * and the returnflag filter on the fact leg, revenue per customer,
    * top-20 heap. The wide-row discipline: the 5 carried customer
    * attributes ride the groupBy as grouping keys (they are
    * functionally dependent on c_custkey but Spark/DuckDB both want
    * them grouped), so the agg shuffles only the quarter's filtered
    * slice — at 100 TB the orderdate filter prunes before the join
    * and the heap keeps the sort bounded. */
  def tpchQ10(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val ord = graft.Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
      .select($"o_orderkey", $"o_custkey")
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val cust = graft.Tables.customer(spark, sfDir)
    val nat = graft.Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name",
        round(AggOps.dec($"c_acctbal"), 6).cast("double").as("c_acctbal"),
        $"n_name")
      .agg(round(sum(AggOps.dec($"l_extendedprice") *
          (lit(BigDecimal(1)) - AggOps.rate($"l_discount"))), 6)
        .cast("double").as("revenue"))
      .select($"c_custkey", $"c_name", $"revenue", $"n_name", $"c_acctbal")
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** q_sql_tpch_q14 — the TPC-H Q14 shape (promotion-revenue share): a
    * month of lineitem joined to part, CASE-split revenue ratio — the
    * canonical conditional-aggregate-over-join. Part is the broadcast
    * side (dim vs fact); the month filter prunes the fact scan before
    * the join; both the promo and total sums come out of ONE aggregate
    * (no second pass), DECIMAL-exact, with the single division at the
    * end. Returns one row — the global aggregate's SinglePartition
    * finish is 1 row by construction. */
  def tpchQ14(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lo = lit("1996-03-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lo && $"l_shipdate" < hi)
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
    val part = graft.Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_type")
    val rev = AggOps.dec($"l_extendedprice") *
      (lit(BigDecimal(1)) - AggOps.rate($"l_discount"))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .agg(
        round(sum(when($"p_type" === "PROMO", rev)
          .otherwise(lit(BigDecimal(0)))), 6).cast("double")
          .as("promo_revenue"),
        round(sum(rev), 6).cast("double").as("total_revenue"))
      .select($"promo_revenue", $"total_revenue",
        round(lit(100.0) * $"promo_revenue" / $"total_revenue", 6)
          .as("promo_pct"))
  }

  /** q_sql_tpch_q19 — the TPC-H Q19 shape (discounted revenue over
    * disjunctive bracket predicates): three OR'd (brand, quantity
    * range) brackets, each a conjunction over BOTH join sides. The
    * planner lesson Q19 exists to teach: the join keys stay a plain
    * equi-join and the disjunction is a post-join filter the optimizer
    * partially pushes per-side (quantity bounds to lineitem's scan,
    * brand set to part's) — never a nested-loop over the OR. Part
    * broadcasts; one aggregate. */
  def tpchQ19(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val part = graft.Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_brand")
    val bracket =
      ($"p_brand" === "Brand#1" && $"l_quantity".between(1, 11)) ||
      ($"p_brand" === "Brand#9" && $"l_quantity".between(10, 20)) ||
      ($"p_brand" === "Brand#20" && $"l_quantity".between(20, 30))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .filter(bracket)
      .agg(count(lit(1)).as("n_lines"),
        round(sum(AggOps.dec($"l_extendedprice") *
          (lit(BigDecimal(1)) - AggOps.rate($"l_discount"))), 6)
          .cast("double").as("revenue"))
  }

  /** q_sql_tpch_q6 — the TPC-H Q6 shape (forecast revenue change): the
    * canonical PREDICATE-PUSHDOWN benchmark — a single filtered
    * aggregate whose year + discount-band + quantity-cap conjunction
    * must ALL reach the parquet scan (PushedFilters carries every leg;
    * ReadSchema carries 4 of 11 columns), leaving one partial+final
    * agg over the surviving slice. No join, no shuffle beyond the
    * 1-row final. */
  def tpchQ6(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    graft.Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lo && $"l_shipdate" < hi &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(count(lit(1)).as("n_lines"),
        round(sum(AggOps.dec($"l_extendedprice") *
          AggOps.rate($"l_discount")), 6).cast("double").as("revenue"))
  }

  /** q_sql_tpch_q4 — the TPC-H Q4 shape (order-priority checking): a
    * quarter of orders kept iff ANY lineitem shipped late (EXISTS →
    * left-semi join; the fact side never multiplies the order rows),
    * counted per priority. The semi join is the decorrelation test:
    * Spark plans EXISTS as a semi on orderkey, AQE broadcasts the
    * filtered order slice, and the count is one partial-agg'd
    * groupBy over 3 rows out. The fixture has no commitdate/
    * receiptdate pair, so "late" is shipdate after the order's
    * quarter end — same shape, same plan. */
  def tpchQ4(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders_v")
    graft.Tables.lineitem(spark, sfDir)
      .createOrReplaceTempView("lineitem_v")
    spark.sql(
      s"""SELECT o_orderpriority, COUNT(*) AS order_count
         |FROM orders_v o
         |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
         |  AND EXISTS (
         |    SELECT 1 FROM lineitem_v l
         |    WHERE l.l_orderkey = o.o_orderkey
         |      AND l.l_shipdate >= TIMESTAMP '1996-04-01 00:00:00')
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_correlated_subquery" -> (correlatedSubquery _),
    "q_sql_recursive_cte" -> (recursiveCalendar _),
    "q_sql_tpch_q3" -> (tpchQ3 _),
    "q_sql_tpch_q5" -> (tpchQ5 _),
    "q_sql_tpch_q10" -> (tpchQ10 _),
    "q_sql_tpch_q4" -> (tpchQ4 _),
    "q_sql_tpch_q6" -> (tpchQ6 _),
    "q_sql_tpch_q14" -> (tpchQ14 _),
    "q_sql_tpch_q18" -> (tpchQ18 _),
    "q_sql_tpch_q19" -> (tpchQ19 _),
    "q_sql_grouping_sets" -> (groupingSets _),
    "q_sql_scalar_subquery" -> (scalarSubquery _),
    "q_sql_in_subquery" -> (inSubquery _),
    "q_sql_cte" -> (cte _),
    "q_sql_lateral" -> (lateralTopPerRegion _),
    "q_sql_pivot" -> (sqlPivot _),
    "q_agg_string_agg" -> (stringAgg _),
    "q_typed_dataset" -> (typedDataset _))

  def oracle: Map[String, String] = Map(
    "q_sql_tpch_q3" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 6) AS DOUBLE)
        |    AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_sql_tpch_q5" ->
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 6) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q_sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 6) AS DOUBLE)
        |    AS revenue,
        |  n_name,
        |  CAST(ROUND(CAST(c_acctbal AS DECIMAL(14,2)), 6) AS DOUBLE)
        |    AS c_acctbal
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_sql_tpch_q6" ->
      """SELECT COUNT(*) AS n_lines,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |    * CAST(l_discount AS DECIMAL(8,4))), 6) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_sql_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate >= TIMESTAMP '1996-04-01 00:00:00')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_sql_tpch_q14" ->
      """WITH a AS (
        |  SELECT
        |    CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(14,2))
        |           * (1 - CAST(l_discount AS DECIMAL(8,4)))
        |      ELSE CAST(0 AS DECIMAL(14,2)) END), 6) AS DOUBLE)
        |      AS promo_revenue,
        |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |      * (1 - CAST(l_discount AS DECIMAL(8,4)))), 6) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
        |SELECT promo_revenue, total_revenue,
        |  round(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
        |FROM a""".stripMargin,
    "q_sql_tpch_q19" ->
      """SELECT COUNT(*) AS n_lines,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |    * (1 - CAST(l_discount AS DECIMAL(8,4)))), 6) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1'  AND l_quantity BETWEEN 1  AND 11)
        |   OR (p_brand = 'Brand#9'  AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q_sql_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(ROUND(CAST(o_totalprice AS DECIMAL(14,2)), 6) AS DOUBLE)
        |    AS o_totalprice,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,2))), 6) AS DOUBLE)
        |    AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 300)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_sql_recursive_cte" ->
      """WITH RECURSIVE months AS (
        |  SELECT date_trunc('month', min(o_orderdate))::DATE AS m,
        |         date_trunc('month', max(o_orderdate))::DATE AS hi
        |  FROM orders
        |  UNION ALL
        |  SELECT (m + INTERVAL 1 MONTH)::DATE, hi FROM months WHERE m < hi
        |)
        |SELECT m AS month_start, COUNT(o_orderkey) AS n_orders,
        |  CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 0),
        |       2) AS DOUBLE) AS total
        |FROM months LEFT JOIN orders
        |  ON date_trunc('month', o_orderdate)::DATE = m
        |GROUP BY m ORDER BY m""".stripMargin,
    "q_sql_correlated_subquery" ->
      """SELECT c_custkey,
        |  COALESCE((SELECT COUNT(*) FROM orders
        |            WHERE o_custkey = c_custkey), 0) AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 20 * (SELECT max(c_acctbal) FROM customer)
        |ORDER BY o_orderkey""".stripMargin,
    "q_sql_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_sql_cte" -> cteSql("orders", "customer"),
    "q_sql_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
        |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q_agg_string_agg" ->
      """WITH d AS (
        |  SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
        |SELECT o_orderstatus,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS priorities,
        |  COUNT(*) AS n_distinct
        |FROM d GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_sql_lateral" ->
      """SELECT r.r_name, t.n_name, t.n_suppliers
        |FROM region r,
        |LATERAL (
        |  SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
        |  FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_suppliers DESC, n.n_name
        |  LIMIT 2
        |) t
        |ORDER BY r.r_name, t.n_suppliers DESC, t.n_name""".stripMargin,
    "q_sql_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 6) AS DOUBLE)
        |    AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_typed_dataset" ->
      """SELECT o_orderstatus AS status,
        |  CASE WHEN o_totalprice >= 200000.0 THEN 'high'
        |       WHEN o_totalprice >= 50000.0 THEN 'mid'
        |       ELSE 'low' END AS spend_bucket,
        |  COUNT(*) AS n
        |FROM orders WHERE o_totalprice > 1000.0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
