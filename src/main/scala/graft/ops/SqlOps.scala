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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_correlated_subquery" -> (correlatedSubquery _),
    "q_sql_grouping_sets" -> (groupingSets _),
    "q_sql_scalar_subquery" -> (scalarSubquery _),
    "q_sql_in_subquery" -> (inSubquery _),
    "q_sql_cte" -> (cte _),
    "q_typed_dataset" -> (typedDataset _))

  def oracle: Map[String, String] = Map(
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
