package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension (SURVEY.md preference order (c):
  * custom LogicalPlan + SparkStrategy + SparkPlan): top-k rows per key.
  *
  * Why not window row_number <= k? That plan SORTS every partition's full
  * row set (shuffle + per-key sort of n rows) before discarding all but
  * k. This operator keeps a bounded heap of k rows per key — O(n log k)
  * with memory k*keys instead of a full sort buffer — which is the shape
  * that survives hot keys at 100 TB. The shuffle still happens (the
  * ClusteredDistribution requirement lets Catalyst plan it), but nothing
  * is ever materialized beyond the heaps.
  */
case class TopKPerKeyPlan(
    k: Int,
    partExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // the operator passes every child column through: claim them all so
  // column pruning can't strip what the heaps re-emit
  override def references: AttributeSet = AttributeSet(child.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, part, order, child) =>
      // two-phase: a partial pass heaps WITHIN each map partition first
      // (no distribution requirement), so the exchange that satisfies the
      // final pass's ClusteredDistribution carries at most k rows per key
      // per mapper instead of every input row — the map-side-combine shape
      // of aggregation, applied to top-k. Top-k composes: the global top-k
      // of a key is the top-k of the union of per-partition top-ks.
      TopKPerKeyExec(k, part, order,
        TopKPerKeyExec(k, part, order, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    k: Int,
    partExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Partial pass: any distribution (runs where the data already is).
    * Final pass with keys: cluster on them. Final pass with NO keys
    * (global top-k): AllTuples — one partition must see every surviving
    * row, otherwise each partition would emit its own "top" k (the
    * silent-wrong-answer mode of the bare public API). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (partExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partExprs) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (kk, part, ord) = (k, partExprs, order)
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(part, schema)
      val ordering = GenerateOrdering.generate(ord, schema)
      // heap comparator is REVERSED: poll() evicts the worst-ranked row
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reversed())
          heaps.put(key.copy(), q)
        }
        q.add(row.copy())
        if (q.size > kk) q.poll()
      }
      heaps.values.asScala.iterator.flatMap { q =>
        val rows = q.asScala.toArray
        java.util.Arrays.sort(rows, ordering)
        rows.iterator
      }.map { r => numOutputRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Public entry: TopKPerKey(df, 3, Seq("status"), Seq("price" -> false,
  * "id" -> true)) — order pairs are (column, ascending). Installs the
  * strategy into the session (idempotent) and resolves columns against
  * the analyzed child. */
object TopKPerKey {
  def apply(df: DataFrame, k: Int, partCols: Seq[String],
            orderCols: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark, TopKPerKeyPlan(k, partCols.map(attr), order, analyzed))
  }
}
