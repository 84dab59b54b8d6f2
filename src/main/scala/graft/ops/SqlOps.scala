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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_correlated_subquery" -> (correlatedSubquery _),
    "q_sql_recursive_cte" -> (recursiveCalendar _),
    "q_sql_tpch_q3" -> (tpchQ3 _),
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
