package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / predicate operators (SURVEY.md §2.3 "project/filter",
  * "filters"; reference D2 time-interval at 01_classification_pipeline.py:44-47,
  * D4 projection, D8 fillna, D16 LIKE at 00_training_pipeline.py:135).
  *
  * All predicates are plain column expressions so Catalyst pushes them into
  * the parquet scan (PushedFilters) — at 100 TB the filter must reach the
  * row-group min/max stats, not run post-scan.
  */
object FilterOps extends graft.QueryModule {

  /** Projection + aliasing + null handling (D4/D8 generalized with
    * nullif/coalesce since the fixtures carry no real nulls). */
  def projectNullFill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.customer(spark, sfDir)
      .select(
        $"c_custkey",
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(none)"))
          .as("segment_or_none"),
        $"c_acctbal".as("balance"))
      .orderBy($"c_custkey")
  }

  /** LIKE predicates (D16: `df.subreddit.like("datascience")`, generalized
    * with wildcards). */
  def filterLike(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.part(spark, sfDir)
      .filter($"p_name".like("small%") || $"p_name".like("%gadget%"))
      .select($"p_partkey", $"p_name", $"p_brand")
      .orderBy($"p_partkey")
  }

  /** Half-open time-interval filter (D2: start <= created < end, one day). */
  def filterTimeRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .filter($"ts" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        $"ts" < lit("2024-01-11 00:00:00").cast("timestamp"))
      .select($"event_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** Compound AND/OR predicate with range + equality legs. */
  def filterCompound(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.lineitem(spark, sfDir)
      .filter($"l_discount".between(0.02, 0.06) &&
        ($"l_quantity" < 10 || $"l_returnflag" === "R") &&
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_project_nullfill" -> (projectNullFill _),
    "q_filter_like" -> (filterLike _),
    "q_filter_time_range" -> (filterTimeRange _),
    "q_filter_compound" -> (filterCompound _))

  def oracle: Map[String, String] = Map(
    "q_filter_project_nullfill" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS segment_or_none,
        |  c_acctbal AS balance
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_filter_like" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_name LIKE 'small%' OR p_name LIKE '%gadget%'
        |ORDER BY p_partkey""".stripMargin,
    "q_filter_time_range" ->
      """SELECT event_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-11 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_filter_compound" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_discount BETWEEN 0.02 AND 0.06
        |  AND (l_quantity < 10 OR l_returnflag = 'R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
