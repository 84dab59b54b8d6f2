package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family lives in its own module exposing
  * `queries: Map[name, (SparkSession, sfDir) => DataFrame]` and
  * `oracle: Map[name, duckdbSql]`; this object is the flat registry the
  * driver consumes. Determinism rules (SURVEY.md §2.5): total ORDER BY on
  * a unique key, decimal-exact money sums, no rand()/time functions.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.AggOps.pricingSummary(spark, "/root/testdata/sf0.001")

  private def modules: Seq[QueryModule] = Seq(
    ops.AggOps, ops.ScanOps, ops.FilterOps, ops.JoinOps,
    ops.WindowOps, ops.SortSetOps, ops.ScalarOps, ops.UdafOps, ops.MlOps,
    ops.SqlOps, ops.TpchOps, ops.ReshapeOps, ops.QualityOps,
    ops.IncrementalOps, ops.EvalOps,
    text.TextOps, text.BpeOps, text.SearchOps, text.CooccurOps, text.LmOps,
    llm.DedupOps, llm.SpanDedup, llm.GraphOps, llm.SimSearchOps,
    llm.MultimodalOps,
    llm.CorpusPipeline, llm.Decontaminate,
    streaming.StreamOps
  ) // widened as milestones land

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every query is wrapped with GraftExtensions.register (idempotent):
    * the optimizer rule / strategy / SQL functions are installed at query
    * entry, so the physical plan a query gets (e.g. whether a
    * row_number<=k window becomes TopKPerKeyExec) is the same on a fresh
    * session regardless of which query ran earlier. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap.map { case (name, fn) =>
      name -> { (s: SparkSession, dir: String) =>
        plans.GraftExtensions.register(s); fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}

/** A named bundle of declared queries + their DuckDB oracle twins. */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
