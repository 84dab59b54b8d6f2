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
  final case class StatusSpend(status: String, n: Long, spend_bucket: String)

  /** Typed Dataset ops: case-class Encoder, typed filter/map, then back to
    * the relational surface for the aggregate (keeps codegen'd agg). */
  def typedDataset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders: Dataset[OrderRow] = graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .as[OrderRow]
    orders
      .filter(o => o.o_totalprice > 1000.0)
      .map(o => StatusSpend(o.o_orderstatus, o.o_orderkey,
        if (o.o_totalprice >= 200000.0) "high"
        else if (o.o_totalprice >= 50000.0) "mid" else "low"))
      .groupBy($"status", $"spend_bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"status", $"spend_bucket")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_grouping_sets" -> (groupingSets _),
    "q_typed_dataset" -> (typedDataset _))

  def oracle: Map[String, String] = Map(
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
