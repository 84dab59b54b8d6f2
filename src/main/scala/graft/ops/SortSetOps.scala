package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sort / top-k / set / dedup operators (SURVEY.md §2.3 "sort/limit",
  * "set ops", "dedup"; reference D3 union at 00_training_pipeline.py:33,
  * D5 limit at 00_training_pipeline.py:40).
  *
  * Scale: top-k uses orderBy(...).limit(k) which Spark executes as
  * TakeOrderedAndProject — per-partition heaps + driver merge of k rows,
  * never a global sort. Set ops shuffle on full-row hash; dedup-by-key is
  * a window pick (deterministic) not dropDuplicates (arbitrary row).
  */
object SortSetOps extends graft.QueryModule {

  /** Top-k: highest-value orders, unique tiebreak on orderkey.
    * Physical plan must be TakeOrderedAndProject, not Sort+Limit. */
  def topK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** Union-all of per-class slices (D3: reduce(append) over frames). */
  def unionAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = graft.Tables.customer(spark, sfDir)
    val slices = Seq("BUILDING", "MACHINERY", "AUTOMOBILE")
      .map(s => c.filter($"c_mktsegment" === s)
        .select($"c_custkey", $"c_mktsegment"))
    slices.reduce(_ unionByName _).orderBy($"c_custkey")
  }

  /** Union distinct of two overlapping key ranges. */
  def unionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = graft.Tables.orders(spark, sfDir)
    val a = o.filter($"o_custkey" < 100).select($"o_custkey")
    val b = o.filter($"o_custkey".between(50, 150)).select($"o_custkey")
    a.union(b).distinct().orderBy($"o_custkey")
  }

  /** Intersect (distinct semantics, same as SQL INTERSECT). */
  def intersectOp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = graft.Tables.customer(spark, sfDir)
    val withOrders = graft.Tables.orders(spark, sfDir)
      .select($"o_custkey".as("c_custkey"))
    c.select($"c_custkey").intersect(withOrders).orderBy($"c_custkey")
  }

  /** Except (distinct semantics, same as SQL EXCEPT): customers minus
    * those with a finished ('F') order. The right side is a FILTERED
    * subset on purpose — against all orders every customer key was
    * subtracted and the result (and its oracle pass) was vacuously
    * empty; the overlap-but-not-containment shape actually exercises
    * EXCEPT's distinct-and-subtract semantics. */
  def exceptOp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = graft.Tables.customer(spark, sfDir)
    val finished = graft.Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("c_custkey"))
    c.select($"c_custkey").except(finished).orderBy($"c_custkey")
  }

  /** EXCEPT ALL — BAG subtraction (multiplicity-aware, SQL:1999): a
    * custkey with 3 open and 1 finished orders survives TWICE, where
    * distinct EXCEPT would drop it entirely. Catalyst plans both ALL
    * variants as a count-aggregate + generate (no row-by-row matching),
    * so they shuffle once on the value like any groupBy. */
  def exceptAllOp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (open, finished) = statusCohorts(spark, sfDir)
    open.exceptAll(finished).orderBy($"o_custkey")
  }

  /** INTERSECT ALL — BAG intersection: min(multiplicity) copies kept. */
  def intersectAllOp(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (open, finished) = statusCohorts(spark, sfDir)
    open.intersectAll(finished).orderBy($"o_custkey")
  }

  /** the (open, finished) custkey bags both ALL variants subtract over —
    * one definition so the cohorts can never silently diverge */
  private def statusCohorts(
      spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val orders = graft.Tables.orders(spark, sfDir)
    (orders.filter($"o_orderstatus" === "O").select($"o_custkey"),
      orders.filter($"o_orderstatus" === "F").select($"o_custkey"))
  }

  /** Deterministic dedup-by-key: earliest order per customer. A window
    * row_number pick, NOT dropDuplicates (which keeps an arbitrary row and
    * would be nondeterministic under shuffle). */
  def dedupFirstPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    graft.Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey".as("first_orderkey"),
        $"o_totalprice".as("first_totalprice"))
      .orderBy($"o_custkey")
  }

  /** Top-3 orders per status through the custom TopKPerKey operator
    * (graft.plans: LogicalPlan + Strategy + Exec with per-key bounded
    * heaps — no per-partition full sort). Ordering includes the unique
    * o_orderkey so heap membership is deterministic; the trailing
    * orderBy is presentation-only. */
  def topKPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val df = graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    graft.plans.TopKPerKey(df, 3, Seq("o_orderstatus"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
      .orderBy($"o_orderstatus", $"o_totalprice".desc, $"o_orderkey")
  }

  /** GLOBAL top-k through the same custom operator with NO keys — the
    * path that requires AllTuples (every surviving row on one partition
    * after the partial heap pass caps each mapper's contribution at k).
    * Declared so the driver exercises the key-less distribution contract
    * every round, not just the spec. */
  def topKGlobalCustom(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val df = graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    graft.plans.TopKPerKey(df, 100, Seq(),
      Seq("o_totalprice" -> false, "o_orderkey" -> true))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
  }

  /** q_sort_zorder — Z-order (Morton) clustering key via the native
    * zorder64 expression: one shipdate month of lineitem, keyed on
    * (l_partkey, l_suppkey) and totally ordered by (zval, orderkey,
    * linenumber). Sorting a write by zval is the multi-column layout
    * that lets parquet row-group stats prune conjunctive range
    * predicates on BOTH key columns (ZOrderSpec measures the actual
    * row-group skip); the query itself is the key computation under the
    * driver's oracle — the DuckDB twin interleaves bits arithmetically. */
  def zorderKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= "1995-03-01" && $"l_shipdate" < "1995-04-01")
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        call_function("zorder64", $"l_partkey", $"l_suppkey").as("zval"))
      .orderBy($"zval", $"l_orderkey", $"l_linenumber")
  }

  /** q_sort_skyline — Pareto skyline (Börzsönyi, Kossmann, Stocker
    * ICDE'01): the parts no other part beats on BOTH axes (cheaper
    * price, larger size, strict somewhere) — the multi-criteria
    * shortlist operator relational engines lack natively. 2-D
    * skylines need no pairwise dominance join: group to the distinct
    * (price, max size) frontier candidates, sweep prices ascending,
    * keep a price iff its best size EXCEEDS the running max of all
    * cheaper prices. The DuckDB twin is the TRUE NOT-EXISTS dominance
    * definition, so equality certifies the sweep implements it.
    *
    * Scale: one partial-agg'd groupBy to the bounded (price, size)
    * domain (fixture: 1000×50 — dominance collapses corpus-sized
    * input to domain-sized candidates first, which is the published
    * approach), then one running-max window over ≤ |prices| rows —
    * never an n² dominance join. */
  def skyline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val best = graft.Tables.part(spark, sfDir)
      .groupBy($"p_retailprice".as("price"), $"p_size")
      .agg(count(lit(1)).as("n"))
      // one row per price: its max size (n tags along — unique per
      // (price, size), so the struct max picks the right count)
      .groupBy($"price")
      .agg(max(struct($"p_size", $"n")).as("t"))
      .select($"price", $"t.p_size".as("smax"), $"t.n".as("n_parts"))
    val prevMax = max($"smax").over(Window.orderBy($"price")
      .rowsBetween(Window.unboundedPreceding, -1)) // bounded price domain
    best.withColumn("pm", prevMax)
      .filter($"pm".isNull || $"smax" > $"pm")
      .select($"price", $"smax", $"n_parts")
      .orderBy($"price")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_skyline" -> (skyline _),
    "q_sort_zorder" -> (zorderKey _),
    "q_sort_topk_global_custom" -> (topKGlobalCustom _),
    "q_sort_topk_per_key" -> (topKPerKey _),
    "q_sort_topk" -> (topK _),
    "q_set_union_all" -> (unionAll _),
    "q_set_union_distinct" -> (unionDistinct _),
    "q_set_intersect" -> (intersectOp _),
    "q_set_except" -> (exceptOp _),
    "q_set_except_all" -> (exceptAllOp _),
    "q_set_intersect_all" -> (intersectAllOp _),
    "q_dedup_first_per_key" -> (dedupFirstPerKey _))

  def oracle: Map[String, String] = Map(
    // the TRUE dominance definition (NOT EXISTS a strictly-better
    // point) — equality certifies the price-ascending sweep
    "q_sort_skyline" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS price, p_size, COUNT(*) AS n
        |  FROM part GROUP BY 1, 2)
        |SELECT a.price, a.p_size AS smax, a.n AS n_parts
        |FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.price <= a.price AND b.p_size >= a.p_size
        |    AND (b.price < a.price OR b.p_size > a.p_size))
        |ORDER BY a.price""".stripMargin,
    // arithmetic bit-interleave twin of the native zorder64 expression
    "q_sort_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(list_sum(list_transform(generate_series(0, 30),
        |    i -> (((l_partkey >> i) & 1) << (2 * i)) +
        |         (((l_suppkey >> i) & 1) << (2 * i + 1)))) AS BIGINT)
        |    AS zval
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-03-01'
        |  AND l_shipdate < TIMESTAMP '1995-04-01'
        |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin,
    "q_sort_topk_global_custom" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_sort_topk_per_key" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_set_union_all" ->
      """SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'
        |UNION ALL
        |SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |ORDER BY c_custkey""".stripMargin,
    "q_set_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_custkey < 100
        |UNION
        |SELECT o_custkey FROM orders WHERE o_custkey BETWEEN 50 AND 150
        |ORDER BY o_custkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey FROM customer
        |INTERSECT SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin,
    "q_set_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_dedup_first_per_key" ->
      """SELECT o_custkey, first_orderkey, first_totalprice FROM (
        |  SELECT o_custkey, o_orderkey AS first_orderkey,
        |         o_totalprice AS first_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
}
