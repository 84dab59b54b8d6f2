package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping operators: pivot (long->wide) and unpivot/melt (wide->long).
  * Capability-closure rows (SURVEY.md §2.3 generalizing D4/D18 projection
  * shaping); no direct reference equivalent.
  *
  * Scale notes: pivot with an EXPLICIT value list is one hash aggregate
  * (no extra distinct-values job, bounded output width); unpivot is a
  * Generate (Expand) — row count multiplies by the number of melted
  * columns but never shuffles.
  */
object ReshapeOps extends graft.QueryModule {

  /** Long->wide: order counts per priority, one column per status.
    * Values are pinned (F/O/P, FIXTURES.md) so the plan skips the
    * collect-distinct pre-job; empty cells are count=null in Spark's
    * pivot and 0 under DuckDB's FILTER — coalesce pins both to 0. */
  def pivotStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }

  /** Wide->long: melt two part metrics into (metric, value) rows.
    * Both melted columns are pre-cast to double (unpivot requires a
    * common value type, and the oracle mirrors the cast). */
  def unpivotPart(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_retailprice",
        $"p_size".cast("double").as("p_size"))
      .unpivot(
        Array($"p_partkey"),
        Array($"p_retailprice", $"p_size"),
        "metric", "value")
      .orderBy($"p_partkey", $"metric")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_reshape_pivot" -> (pivotStatus _),
    "q_reshape_unpivot" -> (unpivotPart _))

  def oracle: Map[String, String] = Map(
    "q_reshape_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_reshape_unpivot" ->
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part
        |ORDER BY p_partkey, metric""".stripMargin)
}
