package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators, all seven flavors (SURVEY.md §2.3 "joins"; the reference
  * has no relational joins — its only join-like construct is the
  * orchestration-level two-input task, 01_classification_pipeline.py:156 —
  * so these generalize that capability over the star schema).
  *
  * 100 TB notes per flavor:
  *  - dims (region/nation/supplier) are broadcast — no shuffle of the fact;
  *  - fact⋈fact equi joins shuffle on the join key and rely on AQE for
  *    skew splitting;
  *  - the range/as-of joins are equi on user_id FIRST (bounded fan-out
  *    ~66 events/user at every sf) and range-filtered inside the join —
  *    never a global theta cross-product.
  */
object JoinOps extends graft.QueryModule {

  /** Inner equi join (shuffle hash / sort-merge — Catalyst's pick). */
  def innerJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = graft.Tables.orders(spark, sfDir)
    val customer = graft.Tables.customer(spark, sfDir)
    orders.join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** Broadcast dim join chain: supplier ⋈ nation ⋈ broadcast(region). */
  def broadcastJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.supplier(spark, sfDir)
      .join(broadcast(graft.Tables.nation(spark, sfDir)),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(graft.Tables.region(spark, sfDir)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_suppliers"),
        AggOps.dsum($"s_acctbal").as("sum_acctbal"))
      .orderBy($"r_name")
  }

  /** Left outer join — customers keep rows with no orders (null orderkey). */
  def leftJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val customer = graft.Tables.customer(spark, sfDir)
    val orders = graft.Tables.orders(spark, sfDir)
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .select($"c_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_custkey", $"o_orderkey")
  }

  /** Full outer join — supplier ⋈ nation keeps nations without suppliers. */
  def fullJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supplier = graft.Tables.supplier(spark, sfDir)
    val nation = graft.Tables.nation(spark, sfDir)
    supplier.join(nation, supplier("s_nationkey") === nation("n_nationkey"), "full")
      .select($"s_suppkey", $"s_name", $"n_nationkey", $"n_name")
      .orderBy($"n_nationkey", $"s_suppkey")
  }

  /** Left semi = EXISTS (generalizes the O5 existence gate relationally). */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val customer = graft.Tables.customer(spark, sfDir)
    val orders = graft.Tables.orders(spark, sfDir)
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left anti = NOT EXISTS. Anti-joined against the HIGH-VALUE order
    * subset (not all orders — on the fixture every customer has some
    * order, which made the result empty and its oracle pass vacuously):
    * customers with no order over 300k. The filter sits on the build
    * side BEFORE the join, so the anti-join's shuffle carries only the
    * qualifying orders. */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val customer = graft.Tables.customer(spark, sfDir)
    val bigOrders = graft.Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 300000)
    customer.join(bigOrders,
        customer("c_custkey") === bigOrders("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Range (theta) join: error events within 10 minutes after a purchase by
    * the same user. Equi on user_id bounds the fan-out; the ts range is a
    * join-condition filter, not a cross product. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"), $"event_id".as("e_id"))
    purchases.join(errors,
        $"p_user" === $"e_user" &&
        $"e_ts" > $"p_ts" &&
        $"e_ts" <= $"p_ts" + expr("INTERVAL 10 MINUTES"))
      .select($"p_user".as("user_id"), $"p_id", $"e_id")
      .orderBy($"p_id", $"e_id")
  }

  /** As-of join: for each error event, the latest purchase by the same user
    * at-or-before it (inner as-of: errors with no prior purchase drop).
    * Implemented as the bounded range join + row_number pick — the same
    * shape DuckDB's ASOF JOIN executes, but oracle-checkable via plain SQL. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"), $"event_id".as("e_id"))
    val joined = errors.join(purchases,
      $"e_user" === $"p_user" && $"p_ts" <= $"e_ts")
    val w = Window.partitionBy($"e_id").orderBy($"p_ts".desc, $"p_id".desc)
    joined.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"e_id", $"e_user".as("user_id"), $"p_id".as("asof_purchase_id"))
      .orderBy($"e_id")
  }

  /** As-of join with TOLERANCE (pandas merge_asof semantics): LEFT
    * as-of — every error event survives — matched to the latest prior
    * purchase by the same user no older than 7 days; staler matches
    * are as-good-as-none (the feature-engineering contract: "recent
    * purchase context or NULL", where an unbounded as-of would happily
    * attach a years-old row). Same bounded-range-join + row_number
    * pick as [[asofJoin]] (rewritten to a TopKPerKey heap); the
    * tolerance ALSO caps the range-join fan-out per event at scale —
    * the unbounded variant's worst case (one user's full history per
    * event) cannot occur. Lag is computed in exact integer ms on both
    * engines. */
  def asofTolerance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"),
        $"event_id".as("p_id"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"),
        $"event_id".as("e_id"))
    val joined = errors.join(purchases,
      $"e_user" === $"p_user" && $"p_ts" <= $"e_ts" &&
        $"p_ts" >= $"e_ts" - expr("INTERVAL 7 DAYS"), "left")
    val w = Window.partitionBy($"e_id")
      .orderBy($"p_ts".desc_nulls_last, $"p_id".desc_nulls_last)
    joined.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"e_id", $"e_user".as("user_id"),
        $"p_id".as("asof_purchase_id"),
        (unix_millis($"e_ts") - unix_millis($"p_ts")).as("lag_ms"))
      .orderBy($"e_id")
  }

  /** Salted skew join (SURVEY.md §4.4): fact rows get a deterministic salt,
    * the dim side is replicated across all salts, the join key becomes
    * (key, salt) so one hot key spreads over SALTS reducers. The oracle is
    * the PLAIN join aggregate — proving salting changes the shuffle layout,
    * not the result. (AQE skew-split is the runtime alternative; salting is
    * the declarative one that also works pre-shuffle.) */
  def saltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val SALTS = 8
    val events = graft.Tables.events(spark, sfDir)
      .withColumn("salt", pmod($"event_id", lit(SALTS)))
    val users = graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("salt", explode(array((0 until SALTS).map(lit(_)): _*)))
    events.join(users,
        events("user_id") === users("c_custkey") &&
        events("salt") === users("salt"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        AggOps.dsum($"value").as("sum_value"))
      .orderBy($"c_mktsegment")
  }

  /** Bucketed co-located join (SURVEY.md §2.3 "broadcast/bucketing" scale
    * note): both sides written bucketBy(8, key) + sortBy, then joined —
    * with bucketing the sort-merge join reads bucket-aligned files and the
    * plan has NO shuffle Exchange on either side (verify with Explain).
    * At 100 TB this is the "pay the shuffle once at ingest, never again"
    * pattern. Oracle = the identical join on the raw tables. */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // content key in the TABLE NAME, covering BOTH source tables: a
    // regeneration of either side gets fresh names, so the exists-check
    // below can never serve stale buckets — and within a session the
    // ingest shuffle is paid ONCE, which is the claim this operator
    // exists to demonstrate (bucket metadata lives in the in-memory
    // catalog, so a fresh JVM re-ingests)
    val key = (graft.Artifacts.key("v1", sfDir, "orders.parquet") + "_" +
      graft.Artifacts.key("v1", sfDir, "customer.parquet") + "_" +
      java.lang.Integer.toHexString(sfDir.hashCode))
      .replaceAll("[^A-Za-z0-9_]", "_")
    val base = s"${graft.Artifacts.root}/graft_buckets_$key"
    def bucketize(df: => DataFrame, table: String, col: String): Unit =
      if (!spark.catalog.tableExists(table))
        df.write.mode("overwrite")
          .bucketBy(8, col).sortBy(col)
          .option("path", s"$base/$table")
          .saveAsTable(table)
    bucketize(graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      s"orders_b_$key", "o_custkey")
    bucketize(graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment"),
      s"customer_b_$key", "c_custkey")
    // hint("merge") forces the sort-merge path (a broadcast would hide the
    // bucket co-location); as a hint it rides the plan, so no session conf
    // is mutated under the driver's feet
    spark.table(s"orders_b_$key").hint("merge")
      .join(spark.table(s"customer_b_$key"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        AggOps.dsum($"o_totalprice").as("sum_price"))
      .orderBy($"c_mktsegment")
  }

  /** Explicit cross join (cartesian) — only ever sane when both sides are
    * tiny (region x region = 25 rows); anything larger must go through an
    * equi/range condition instead. */
  def crossJoinSmall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val a = graft.Tables.region(spark, sfDir)
      .select($"r_regionkey".as("a_key"), $"r_name".as("a_name"))
    val b = graft.Tables.region(spark, sfDir)
      .select($"r_regionkey".as("b_key"), $"r_name".as("b_name"))
    a.crossJoin(b)
      .select($"a_key", $"b_key", concat_ws("-", $"a_name", $"b_name").as("pair"))
      .orderBy($"a_key", $"b_key")
  }

  /** Right outer join (symmetric twin of q_join_left, kept for surface
    * completeness — Catalyst plans it as the mirrored left join). */
  def rightJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir),
        $"o_custkey" === $"c_custkey", "right")
      .select($"c_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_custkey", $"o_orderkey")
  }

  /** Bloom-pruned semi-join (the runtime-filter pattern, built by hand):
    * the selective side's join keys go into a BloomFilter sketch (bounded
    * size, the one driver-side object — same legitimacy as the CMS), the
    * big fact side is pre-filtered with might_contain BEFORE its shuffle,
    * and the exact join afterwards removes the bloom's false positives —
    * so the result is EXACTLY the plain join (the oracle) while the fact
    * shuffle carries ~selectivity x rows instead of all of them. This is
    * what Spark's own runtime bloom filter injection does; materializing
    * it as an operator makes the 100 TB shuffle-pruning contract explicit
    * and testable. */
  def bloomPrunedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val urgent = graft.Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_custkey")
    // capacity is a fixed overestimate, NOT urgent.count(): sizing the
    // sketch exactly would cost a full extra scan of the selective side
    // before any pruning benefit; a bloom only degrades gracefully (less
    // full = lower fpp), and 4M keys x 0.1% fpp is ~7 MB — at a real
    // deployment the number comes from table statistics, not a job
    val bloom = urgent.stat.bloomFilter($"o_orderkey",
      expectedNumItems = 4000000L, fpp = 0.001)
    val mightContain = udf((k: Long) => bloom.mightContain(k))
    graft.Tables.lineitem(spark, sfDir)
      .filter(mightContain($"l_orderkey")) // prunes BEFORE the shuffle
      .join(urgent, $"l_orderkey" === $"o_orderkey") // exact: kills FPs
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_items"),
        graft.ops.AggOps.dsum($"l_extendedprice").as("sum_price"))
      .orderBy($"o_custkey")
  }

  /** Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of vanishing — the semantics dimension the other
    * twelve flavors don't cover. Keys are made nullable in-plan (every
    * custkey divisible by 10 becomes NULL) so the NULL bucket is
    * non-empty and deterministic. */
  def nullSafeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        when($"o_custkey" % 10 === 0, lit(null)).otherwise($"o_custkey")
          .as("k"))
    val a = o.groupBy($"k").agg(count(lit(1)).as("n_all"))
    val b = o.filter($"o_orderkey" % 2 === 0)
      .groupBy($"k").agg(count(lit(1)).as("n_even"))
    a.join(b, a("k") <=> b("k"))
      .select(a("k").as("k"), $"n_all", $"n_even")
      .orderBy($"k")
  }

  /** q_join_asof_nearest — NEAREST as-of join (pandas
    * merge_asof(direction='nearest')): each error event matches the
    * purchase by the same user with the smallest |Δt| within ±1 day,
    * in EITHER direction — the sensor-fusion/alignment variant the
    * backward-only [[asofJoin]] can't express (a purchase 1 min AFTER
    * the error beats one 5 h before). LEFT semantics: unmatched
    * errors survive with NULLs. Tie |Δt| → smaller purchase id;
    * lag_ms is signed (purchase − error), exact integer ms.
    *
    * Scale: the ±tolerance range join bounds per-event fan-out
    * exactly like [[asofTolerance]]; the per-event argmin is ONE
    * struct-min aggregation (no window, no sort) — partial-agg'd, so
    * candidate rows collapse map-side. */
  def asofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dayMs = 86400000L
    val ev = graft.Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), unix_millis($"ts").as("p_ms"),
        $"event_id".as("p_id"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), unix_millis($"ts").as("e_ms"),
        $"event_id".as("e_id"))
    val best = errors.join(purchases,
        $"e_user" === $"p_user" &&
          abs($"p_ms" - $"e_ms") <= dayMs)
      .groupBy($"e_id")
      .agg(min(struct(abs($"p_ms" - $"e_ms").as("adt"), $"p_id",
        ($"p_ms" - $"e_ms").as("sdt"))).as("t"))
      .select($"e_id", $"t.p_id".as("nearest_purchase_id"),
        $"t.sdt".as("lag_ms"))
    errors.join(best, Seq("e_id"), "left")
      .select($"e_id", $"e_user".as("user_id"),
        $"nearest_purchase_id", $"lag_ms")
      .orderBy($"e_id")
  }

  /** q_join_interval_overlap — interval-overlap self-join via BIN
    * DECOMPOSITION, the standard scale rewrite for temporal overlap
    * (a raw `a.s ≤ b.e AND b.s ≤ a.e` theta join plans as a per-key
    * nested loop — O(n²) per customer and a cartesian without a key):
    * each order carries a validity interval [orderdate, orderdate +
    * 1 + key%5 days]; every interval EXPLODES to the calendar weeks
    * it touches (≤ 2 bins for ≤ 6-day spans — the fan-out is
    * ⌈span/binwidth⌉+1, a constant here), candidates meet through the
    * (custkey, week) EQUI join, the exact predicate filters, and
    * DISTINCT collapses pairs that met in both shared bins. Readout:
    * per customer, how many of their order pairs overlap in time.
    *
    * Scale: the join is a plain shuffled equi join on a composite
    * key — no nested loop, no cartesian (plan-pinned in Wave13eSpec);
    * bin width trades fan-out (longer spans → more bins/row) against
    * candidate density (wider bins → more false candidates), the
    * documented knob. */
  def intervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val iv = graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("k"), $"o_custkey".as("c"),
        to_date($"o_orderdate").as("s"))
      .withColumn("e",
        date_add($"s", (lit(1) + pmod($"k", lit(5L))).cast("int")))
    val binned = iv.withColumn("bin", explode(sequence(
      expr("datediff(s, date'1995-01-01') div 7"),
      expr("datediff(e, date'1995-01-01') div 7"))))
    val a = binned.select($"c", $"bin", $"k".as("ka"), $"s".as("sa"),
      $"e".as("ea"))
    val b = binned.select($"c", $"bin", $"k".as("kb"), $"s".as("sb"),
      $"e".as("eb"))
    a.join(b, Seq("c", "bin")) // equi join on (customer, week)
      .filter($"ka" < $"kb" && $"sa" <= $"eb" && $"sb" <= $"ea")
      .select($"c", $"ka", $"kb").distinct() // pairs met in 2 bins once
      .groupBy($"c").agg(count(lit(1)).as("n_overlapping_pairs"))
      .select($"c".as("o_custkey"), $"n_overlapping_pairs")
      .orderBy($"o_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_interval_overlap" -> (intervalOverlap _),
    "q_join_asof_nearest" -> (asofNearest _),
    "q_join_null_safe" -> (nullSafeJoin _),
    "q_join_bloom_pruned" -> (bloomPrunedJoin _),
    "q_join_right" -> (rightJoin _),
    "q_join_cross" -> (crossJoinSmall _),
    "q_join_salted_skew" -> (saltedJoin _),
    "q_join_bucketed_colocated" -> (bucketedJoin _),
    "q_join_inner" -> (innerJoin _),
    "q_join_broadcast" -> (broadcastJoin _),
    "q_join_left" -> (leftJoin _),
    "q_join_full" -> (fullJoin _),
    "q_join_semi" -> (semiJoin _),
    "q_join_anti" -> (antiJoin _),
    "q_join_range" -> (rangeJoin _),
    "q_join_asof" -> (asofJoin _),
    "q_join_asof_tolerance" -> (asofTolerance _))

  def oracle: Map[String, String] = Map(
    // the twin is the NAIVE theta self-join the bin decomposition
    // replaces — equality certifies the rewrite lossless (no pair
    // missed across a bin boundary, no duplicate from shared bins)
    "q_join_interval_overlap" ->
      """WITH iv AS (
        |  SELECT o_orderkey AS k, o_custkey AS c,
        |    CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) +
        |      CAST((1 + o_orderkey % 5) AS INT) AS e
        |  FROM orders)
        |SELECT a.c AS o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_overlapping_pairs
        |FROM iv a JOIN iv b
        |  ON a.c = b.c AND a.k < b.k AND a.s <= b.e AND b.s <= a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_join_asof_nearest" ->
      """WITH p AS (
        |  SELECT user_id AS p_user, epoch_ms(ts) AS p_ms,
        |    event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (
        |  SELECT user_id AS e_user, epoch_ms(ts) AS e_ms,
        |    event_id AS e_id
        |  FROM events WHERE event_type = 'error'),
        |m AS (
        |  SELECT e_id, p_id AS nearest_purchase_id, p_ms - e_ms AS lag_ms,
        |    ROW_NUMBER() OVER (PARTITION BY e_id
        |      ORDER BY abs(p_ms - e_ms), p_id) AS rn
        |  FROM e JOIN p ON e_user = p_user
        |    AND abs(p_ms - e_ms) <= 86400000)
        |SELECT e.e_id, e.e_user AS user_id,
        |  m.nearest_purchase_id, m.lag_ms
        |FROM e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
        |  ON e.e_id = m.e_id
        |ORDER BY e.e_id""".stripMargin,
    "q_join_null_safe" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END AS k
        |  FROM orders),
        |a AS (SELECT k, COUNT(*) AS n_all FROM o GROUP BY k),
        |b AS (SELECT k, COUNT(*) AS n_even FROM o
        |      WHERE o_orderkey % 2 = 0 GROUP BY k)
        |SELECT a.k AS k, a.n_all, b.n_even
        |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k""".stripMargin,
    // the bloom is pruning-only: the oracle is the PLAIN join
    "q_join_bloom_pruned" ->
      """SELECT o_custkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_join_cross" ->
      """SELECT a.r_regionkey AS a_key, b.r_regionkey AS b_key,
        |  concat_ws('-', a.r_name, b.r_name) AS pair
        |FROM region a CROSS JOIN region b
        |ORDER BY a_key, b_key""".stripMargin,
    "q_join_bucketed_colocated" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_salted_skew" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_join_full" ->
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |FROM supplier FULL OUTER JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_nationkey, s_suppkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_range" ->
      """SELECT p.user_id AS user_id, p.event_id AS p_id, e.event_id AS e_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.user_id
        | AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 10 MINUTE
        |ORDER BY p_id, e_id""".stripMargin,
    "q_join_asof" ->
      """SELECT e_id, user_id, asof_purchase_id FROM (
        |  SELECT e.event_id AS e_id, e.user_id AS user_id,
        |         p.event_id AS asof_purchase_id,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'error') e
        |  JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON e.user_id = p.user_id AND p.ts <= e.ts)
        |WHERE rn = 1 ORDER BY e_id""".stripMargin,
    "q_join_asof_tolerance" ->
      """SELECT e_id, user_id, asof_purchase_id, lag_ms FROM (
        |  SELECT e.event_id AS e_id, e.user_id AS user_id,
        |         p.event_id AS asof_purchase_id,
        |         epoch_ms(e.ts) - epoch_ms(p.ts) AS lag_ms,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY p.ts DESC NULLS LAST,
        |                                     p.event_id DESC NULLS LAST)
        |           AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'error') e
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |    ON e.user_id = p.user_id AND p.ts <= e.ts
        |   AND p.ts >= e.ts - INTERVAL 7 DAY)
        |WHERE rn = 1 ORDER BY e_id""".stripMargin)
}
