package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality constraint auditing — the "production-ready" layer every
  * scheduled pipeline needs before publishing a table (the reference's
  * whole premise; its Clean tasks are trust boundaries between stages).
  * Each check is one aggregate/anti-join over the audited table; the
  * result is a tiny (check_name, violations) report, so the audit costs
  * one pass per table regardless of scale and the checks compose into
  * the task DAG as a gate (fail the run iff any violations > 0).
  */
object QualityOps extends graft.QueryModule {

  def constraintAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = graft.Tables.orders(spark, sfDir)
    val customer = graft.Tables.customer(spark, sfDir)
    val lineitem = graft.Tables.lineitem(spark, sfDir)
    // an ungrouped count() always yields exactly one non-null row
    def report(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"), $"violations")
    val nullKey = report("orders_null_key",
      orders.agg(count(when($"o_orderkey".isNull, 1)).as("violations")))
    val dupKey = report("orders_dup_key",
      orders.groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
        .filter($"n" > 1).agg(count(lit(1)).as("violations")))
    val orphanCust = report("orders_orphan_custkey",
      orders.join(customer, $"o_custkey" === $"c_custkey", "left_anti")
        .agg(count(lit(1)).as("violations")))
    val orphanOrder = report("lineitem_orphan_orderkey",
      lineitem.join(orders, $"l_orderkey" === $"o_orderkey", "left_anti")
        .agg(count(lit(1)).as("violations")))
    val negPrice = report("orders_negative_price",
      orders.agg(count(when($"o_totalprice" < 0, 1)).as("violations")))
    nullKey.unionByName(dupKey).unionByName(orphanCust)
      .unionByName(orphanOrder).unionByName(negPrice)
      .orderBy($"check_name")
  }

  /** q_quality_k_anonymity — re-identification audit (Sweeney's
    * k-anonymity, IJUFKS 2002) over the events table: group by the
    * quasi-identifier (event_type, day, value decile band) and flag
    * every group observed for FEWER than k=5 distinct users — rows in
    * those groups are re-identifiable by their quasi-identifier alone
    * and must be suppressed or generalized before the table is shared
    * as training data. One partial-agg'd groupBy; the distinct-user
    * count two-phases on (qid, user_id). The report is the VIOLATION
    * set (small by construction at any scale); the gate is rows == 0. */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("day"),
        floor($"value" / 10).cast("long").as("value_band"))
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_rows"))
      .filter($"n_users" < 5)
      .orderBy($"event_type", $"day", $"value_band")
  }

  /** q_quality_outlier_iqr — Tukey-fence outlier audit (EDA, Tukey
    * 1977) on events.value per event_type: values beyond 1.5×IQR of
    * their group are flagged and summarized. Two passes over events:
    * one partial-agg'd percentile per group, then a BROADCAST of the
    * tiny per-group fence table back onto the scan (groups are bounded
    * by the event-type vocabulary, never by data volume, so the
    * broadcast is safe at 100 TB). Fences are rounded to 6dp in both
    * engines before comparing so the interpolated quartile is
    * bit-identical across Spark and DuckDB. */
  def outlierIqr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val fences = ev.groupBy($"event_type").agg(
      round(percentile($"value", lit(0.25)), 6).as("q1"),
      round(percentile($"value", lit(0.75)), 6).as("q3"))
    val lo = $"q1" - lit(1.5) * ($"q3" - $"q1")
    val hi = $"q3" + lit(1.5) * ($"q3" - $"q1")
    ev.join(broadcast(fences), "event_type")
      .filter($"value" < lo || $"value" > hi)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_outliers"),
        round(min($"value"), 2).as("min_out"),
        round(max($"value"), 2).as("max_out"))
      .orderBy($"event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_constraint_audit" -> (constraintAudit _),
    "q_quality_k_anonymity" -> (kAnonymity _),
    "q_quality_outlier_iqr" -> (outlierIqr _))

  def oracle: Map[String, String] = Map(
    "q_quality_constraint_audit" ->
      """SELECT * FROM (
        |  SELECT 'orders_null_key' AS check_name,
        |    COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_dup_key', COUNT(*) FROM (
        |    SELECT o_orderkey FROM orders
        |    GROUP BY o_orderkey HAVING COUNT(*) > 1)
        |  UNION ALL
        |  SELECT 'orders_orphan_custkey', COUNT(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey', COUNT(*) FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey)
        |  UNION ALL
        |  SELECT 'orders_negative_price',
        |    COUNT(*) FILTER (WHERE o_totalprice < 0)
        |  FROM orders)
        |ORDER BY check_name""".stripMargin,
    "q_quality_k_anonymity" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(floor(value / 10) AS BIGINT) AS value_band,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_rows
        |FROM events GROUP BY 1, 2, 3
        |HAVING count(DISTINCT user_id) < 5
        |ORDER BY event_type, day, value_band""".stripMargin,
    "q_quality_outlier_iqr" ->
      """WITH fences AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.25), 6) AS q1,
        |    round(quantile_cont(value, 0.75), 6) AS q3
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n_outliers,
        |  round(min(value), 2) AS min_out, round(max(value), 2) AS max_out
        |FROM events e JOIN fences f ON e.event_type = f.event_type
        |WHERE value < q1 - 1.5 * (q3 - q1) OR value > q3 + 1.5 * (q3 - q1)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
}
