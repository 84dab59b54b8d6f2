package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window operators (SURVEY.md §2.3 "window" rows): ranking, analytic,
  * explicit frames. No reference equivalent (its relational surface has no
  * windows) — declared as part of the capability closure.
  *
  * Determinism: every ORDER BY inside a window carries a unique tiebreaker
  * column, otherwise rank/lag results are permutation-dependent.
  * Scale: windows shuffle once on partitionBy keys; partition-local sort
  * after that. partitionBy cardinality (mktsegment=5, user≈sf*1500,
  * custkey) keeps per-partition state bounded.
  */
object WindowOps extends graft.QueryModule {

  /** row_number / rank / dense_rank / ntile over a value ordering. */
  def ranking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"))
      .orderBy($"c_custkey")
  }

  /** lag / lead / first / last per user ordered by event time. */
  def analytic(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value"),
        first($"value").over(w).as("first_value"),
        last($"value").over(w).as("last_value"))
      .orderBy($"event_id")
  }

  /** Explicit frame: running total per customer (decimal-exact then cast —
    * same discipline as AggOps). */
  def runningSum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey",
        sum(AggOps.dec($"o_totalprice")).over(w).cast("double")
          .as("running_total"))
      .orderBy($"o_orderkey")
  }

  /** RANGE frame: trailing-30-day spend per customer, ordered by a numeric
    * day offset so the frame bound is engine-portable (Spark's interval
    * range frames and DuckDB's RANGE INTERVAL disagree on types; integer
    * days agree everywhere). */
  def rangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"day")
      .rangeBetween(-30, Window.currentRow)
    graft.Tables.orders(spark, sfDir)
      .withColumn("day",
        datediff($"o_orderdate", lit("1995-01-01").cast("date")))
      .select($"o_orderkey", $"o_custkey", $"day",
        sum(AggOps.dec($"o_totalprice")).over(w).cast("double")
          .as("trailing_30d_spend"))
      .orderBy($"o_orderkey")
  }

  /** percent_rank / cume_dist distribution functions. The window ordering
    * (c_acctbal, c_custkey) is tie-free, so both engines see identical
    * rank positions; outputs are rationals of row counts, exact in double
    * up to the 6-dp rounding. */
  def distribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal", $"c_custkey")
    graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy($"c_custkey")
  }

  /** Ordered event funnel (the windowFunnel shape of OLAP engines): per
    * user, the first view, the first click AFTER that view, the first
    * purchase AFTER that click — funnel_stage = how deep the user got.
    * Three stage aggregates chained by (user equi-join + strictly-later
    * filter): each stage shuffles only users who survived the previous
    * one, never a per-user event sort. */
  def eventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val users = ev.select($"user_id").distinct()
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v_ts"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"ts" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts").as("c_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"ts" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("funnel_stage",
        when($"p_ts".isNotNull, 3).when($"c_ts".isNotNull, 2)
          .when($"v_ts".isNotNull, 1).otherwise(0))
      .select($"user_id", $"funnel_stage",
        unix_millis($"v_ts").as("v_ms"), unix_millis($"c_ts").as("c_ms"),
        unix_millis($"p_ts").as("p_ms"))
      .orderBy($"user_id")
  }

  /** Time-series resample + gap fill: daily per-user activity on a dense
    * calendar spine — days with no events appear as explicit zeros (the
    * shape every downstream window/trend computation needs). The spine is
    * users x sequence(min_day, max_day): the corpus bounds come from a
    * broadcast 1-row aggregate in the same plan, and the explode is
    * bounded by the calendar length, never by event count. */
  def resampleGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val daily = ev
      .groupBy($"user_id", date_trunc("DAY", $"ts").as("day"))
      .agg(count(lit(1)).as("n"), AggOps.dsum($"value").as("sum_value"))
    val bounds = broadcast(ev.agg(
      date_trunc("DAY", min($"ts")).as("d0"),
      date_trunc("DAY", max($"ts")).as("d1")))
    val spine = ev.select($"user_id").distinct()
      .crossJoin(bounds)
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", unix_millis($"day").as("day_ms"),
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
      .orderBy($"user_id", $"day_ms")
  }

  /** 7-day trailing moving average over the gap-filled series — the
    * composition resampling exists for (a moving average over sparse
    * days silently shrinks its window; over the dense spine it is the
    * true calendar average). Determinism: the frame sum is DECIMAL-exact
    * (window sums of doubles may be computed incrementally/sliding and
    * differ across engines in the last ulp), divided once by the frame
    * count. */
  def movingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day_ms")
      .rowsBetween(-6, 0)
    resampleGapfill(spark, sfDir)
      .withColumn("ma7", round(
        sum($"sum_value".cast("decimal(14,2)")).over(w).cast("double") /
          count(lit(1)).over(w), 6))
      .select($"user_id", $"day_ms", $"n", $"sum_value", $"ma7")
      .orderBy($"user_id", $"day_ms")
  }

  /** q_window_rfm_segments — RFM customer segmentation (Hughes,
    * "Strategic Database Marketing" 1994; the standard CRM quintile
    * recipe): per customer recency (days since last order, vs the
    * corpus max date), frequency (order count), monetary (decimal-exact
    * spend), each scored 1-5 by ntile over a deterministic
    * (metric, c_custkey) order — recency ASCENDS so "most recent" gets
    * score 5 after the 6-x flip, matching the convention that 555 is
    * the best cell. Output is the segment-cell census (≤125 rows at
    * any scale): one orders pass for the per-customer rollup, then the
    * three quintile scores computed WITHOUT any keyless window — a
    * keyless ntile would single-partition-sort the billion-customer
    * rollup on a real cluster. Instead, ntile's exact equal-count
    * semantics (so the ntile-based oracle is unchanged) come from the
    * two-level global rank already proven on q_ml_global_shuffle: the
    * three metrics go to long format (3n rows), each value is
    * range-bucketed by approx-percentile boundaries (boundaries affect
    * only BALANCE — per-bucket ranks plus exact bucket-count offsets
    * reconstruct the exact global row_number wherever the cuts fall),
    * ranked inside (metric, bucket) partitions in parallel, offset by
    * the ≤3×33-row bucket-count ledger (bounded driver collect, the
    * reviewed k-centroids pattern), and mapped to tiles with the
    * standard SQL ntile formula (first n%5 tiles take one extra row)
    * as integer DIV arithmetic on the reconstructed position. No
    * Exchange SinglePartition anywhere in the declared plan — this
    * query runs PlanAudit with no allowance. */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rolled = graft.Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(max(to_date($"o_orderdate")).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(AggOps.dec($"o_totalprice")).as("monetary"))
      .localCheckpoint() // one orders scan feeds max-day AND the rollup
    // corpus max date: 1-row bounded collect off the rollup (keeps the
    // global-agg SinglePartition exchange out of the declared plan)
    val maxDay = rolled.agg(max($"last_day")).head.getDate(0)
    // long format: (custkey, metric, value) with DECIMAL-exact ordering
    // values (recency days / order count / cents-exact spend all embed
    // exactly in DECIMAL(26,6)); `dv` is the double shadow used only
    // for range-bucketing, where monotone-but-lossy is sufficient
    val per = rolled.select($"o_custkey",
      datediff(lit(maxDay), $"last_day").cast("decimal(26,6)").as("recency"),
      $"frequency".cast("decimal(26,6)").as("frequency"),
      $"monetary".cast("decimal(26,6)").as("monetary"))
    val long = per.select($"o_custkey", expr(
      """stack(3, 'r', recency, 'f', frequency, 'm', monetary)
        |AS (metric, value)""".stripMargin))
      .withColumn("dv", $"value".cast("double"))
    val nCust = rolled.count()
    val nB = 32
    val probs = (1 until nB).map(_.toDouble / nB)
    val bndRows = long.groupBy($"metric")
      .agg(percentile_approx($"dv", lit(probs.toArray), lit(10000)).as("b"))
      .as[(String, Seq[Double])].collect() // 3 rows
    val bnds = bndRows.toSeq.map { case (m, b) =>
      (m, b.distinct.sorted.toArray) }
      .toDF("metric", "bnds")
    val bucketed = long.join(broadcast(bnds), Seq("metric"))
      .withColumn("__b", size(filter($"bnds", x => x < $"dv")))
      .drop("bnds", "dv")
    val wb = Window.partitionBy($"metric", $"__b")
      .orderBy($"value".asc, $"o_custkey".asc)
    val ranked = bucketed
      .withColumn("__rk", row_number().over(wb).cast("long"))
    // exact per-bucket counts -> global offsets, computed driver-side
    // over the <= 3*(nB+1)-row ledger (bounded by construction)
    val counts = ranked.groupBy($"metric", $"__b")
      .agg(count(lit(1)).as("c"))
      .as[(String, Int, Long)].collect()
    val offsets = counts.groupBy(_._1).toSeq.flatMap { case (m, rows) =>
      rows.sortBy(_._2).scanLeft((m, -1, 0L, 0L)) {
        case ((_, _, off, n), (_, b, c)) => (m, b, off + n, c)
      }.drop(1).map { case (mm, b, off, _) => (mm, b, off) }
    }.toDF("metric", "__b", "__off")
    // standard SQL ntile(5) over n rows from the exact global position:
    // q = n/5, r = n%5; the first r tiles take q+1 rows
    val q = nCust / 5; val r = nCust % 5
    val tile =
      if (q == 0L) expr("CAST(__pos AS INT)")
      else expr(
        s"""CAST(CASE WHEN __pos <= ${r * (q + 1)}
           |  THEN (__pos - 1) DIV ${q + 1} + 1
           |  ELSE $r + (__pos - ${r * (q + 1)} - 1) DIV $q + 1
           |END AS INT)""".stripMargin)
    val scored = ranked.join(broadcast(offsets), Seq("metric", "__b"))
      .withColumn("__pos", $"__off" + $"__rk")
      .withColumn("tile", tile)
      .groupBy($"o_custkey")
      .agg( // recency flips so fewest days -> score 5
        (lit(6) - max(when($"metric" === "r", $"tile"))).as("r"),
        max(when($"metric" === "f", $"tile")).as("f"),
        max(when($"metric" === "m", $"tile")).as("m"))
    scored.groupBy($"r", $"f", $"m")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"r", $"f", $"m")
  }

  /** q_window_transitions — the session path transition matrix (the
    * Markov-chain readout behind "where do users go next"): within
    * each 10-minute-gap session (the q_stream_session sessionization,
    * re-derived here with the lag>gap + running-sum trick so the
    * semantics stay the oracle's), count event_type -> NEXT event_type
    * transitions and their within-source probability. Two windows over
    * the same (user_id, ts, event_id) sort — Catalyst evaluates them
    * in one partition-local pass — then a vocabulary-bounded groupBy:
    * the matrix is |event types|² rows at any scale. Probabilities are
    * integer ratios rounded 6dp over a broadcast per-source total. */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val marked = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      // gaps compared in MICROseconds (full timestamp precision) so a
      // sub-ms fixture can never make these session boundaries diverge
      // from q_stream_session's, whose oracle pins the same precision
      .withColumn("new_s",
        when(unix_micros($"ts") -
          unix_micros(lag($"ts", 1).over(wOrd)) >= 600000000L, 1)
          .when(lag($"ts", 1).over(wOrd).isNull, 1).otherwise(0))
      .withColumn("sid", sum($"new_s")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val wSess = Window.partitionBy($"user_id", $"sid")
      .orderBy($"ts", $"event_id")
    val pairs = marked
      .withColumn("to_type", lead($"event_type", 1).over(wSess))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // |types|^2 rows; totals derive from it
    val totals = pairs.groupBy($"from_type")
      .agg(sum($"n").as("n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select($"from_type", $"to_type", $"n",
        round($"n".cast("double") / $"n_from", 6).as("p"))
      .orderBy($"from_type", $"to_type")
  }

  /** q_window_attribution — multi-touch conversion attribution (the
    * marketing-analytics standard: credit the touches that preceded a
    * purchase), computed entirely with per-user windows so a 100 TB
    * event log never self-joins: each non-purchase touch finds its NEXT
    * purchase by a min-over-following-frame window (one shuffle on
    * user_id), keeps it if within the 7-day lookback, and each
    * conversion's touch list is ranked in one more window to yield
    * first-touch / last-touch / linear credit per touch type. Linear
    * credit is carried as INTEGER millionths (1000000 div n per touch,
    * summed as BIGINT, divided once at the end) so partial-aggregation
    * order can't wiggle the double sum. Same-microsecond purchases of
    * one user coalesce into one conversion (the ts-keyed conversion
    * identity) — documented, deterministic at any scale. */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val SevenDaysUs = 604800000000L
    val wNext = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    val touches = graft.Tables.events(spark, sfDir)
      .filter($"user_id".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("conv_ts",
        min(when($"event_type" === "purchase", $"ts")).over(wNext))
      .filter($"event_type" =!= "purchase" && $"conv_ts".isNotNull &&
        unix_micros($"conv_ts") - unix_micros($"ts") <= SevenDaysUs)
    val wConv = Window.partitionBy($"user_id", $"conv_ts")
    val ranked = touches
      .withColumn("rk", row_number().over(wConv.orderBy($"ts", $"event_id")))
      .withColumn("n_t", count(lit(1)).over(wConv))
      .withColumn("credit_ppm", expr("1000000 div n_t"))
    ranked.groupBy($"event_type")
      .agg(count(lit(1)).as("n_touches"),
        sum(when($"rk" === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when($"rk" === $"n_t", 1L).otherwise(0L)).as("n_last"),
        round(sum($"credit_ppm").cast("double") / 1e6, 6)
          .as("linear_credit"))
      .orderBy($"event_type")
  }

  /** q_window_anomaly_zscore — rolling z-score anomaly flags per user:
    * each event scored against ITS OWN trailing 7-event window (mean +
    * population variance over ROWS BETWEEN 6 PRECEDING AND CURRENT),
    * |z| > 2 flagged — the standard online anomaly gate, windowed so
    * a user's baseline is local, not global. Numeric discipline: the
    * window sums are exact DECIMAL (value as (14,2), its square as
    * (28,4) — both order-independent under any partial split), cast to
    * double ONCE, and the variance is the textbook (nΣx²−(Σx)²)/n²
    * evaluated in the SAME operation order in both engines; z is the
    * single round(,6), and the flag compares the ROUNDED z so the
    * branch can't straddle a last-ulp. One shuffle on user_id; frames
    * are 7 rows of state per partition stream at any scale. */
  def anomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val w7 = w.rowsBetween(-6, 0)
    val dec = AggOps.dec($"value")
    val n = count(lit(1)).over(w7).cast("double")
    val s1 = sum(dec).over(w7).cast("double")
    val s2 = sum(dec * dec).over(w7).cast("double")
    graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ts_ms"),
        $"value", n.as("n"), s1.as("s1"), s2.as("s2"))
      .withColumn("variance", ($"n" * $"s2" - $"s1" * $"s1") / ($"n" * $"n"))
      .withColumn("z",
        when($"variance" > 1e-12,
          round(($"value" - $"s1" / $"n") / sqrt($"variance"), 6)))
      .select($"user_id", $"event_id", $"ts_ms", $"value",
        $"n".cast("long").as("n_window"), $"z",
        (abs(coalesce($"z", lit(0.0))) > 2.0).cast("int").as("is_anomaly"))
      .orderBy($"user_id", $"ts_ms", $"event_id")
  }

  /** q_window_ewma — exponentially-weighted moving average (α = 1/2)
    * of each customer's order values, the standard time-series
    * smoother next to [[movingAvg]]'s uniform window. The recursion
    * s_t = α·x_t + (1−α)·s_{t−1} is truncated at 16 terms and
    * normalized over the weights present (partial windows at a
    * customer's history start use exactly the lags that exist):
    * ewma_t = Σ_{i<m} 2^{15−i}·x_{t−i} / (2^16 − 2^{16−m}),
    * m = min(rn, 16). EXACT arithmetic with no decimal: every term
    * 2^{15−i}·x is a 2-dp value below 2^53/100, so the double sum is
    * integer-exact at the cent scale in both engines; the single
    * division is floored at micro (the round-tie-proof recipe).
    * Scale: one shuffle on o_custkey, one partition-local sort, 16
    * in-frame lags — no second pass, no unbounded frame state. */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wsum = (0 until 16).map(i =>
      coalesce(lag($"o_totalprice", i).over(w), lit(0.0)) *
        lit((1L << (15 - i)).toDouble)).reduce(_ + _)
    val m = least(row_number().over(w), lit(16))
    graft.Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("denom", lit(65536.0) - pow(lit(2.0), lit(16) - m))
      .withColumn("ewma",
        (floor(wsum / $"denom" * 1e6).cast("long") / 1e6))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"ewma")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** q_window_cusum — CUSUM change-point detection (Page 1954) over
    * the daily-revenue series: S_t = max(0, S_{t−1} + x_t − k) with
    * k = the series mean. The recursion LOOKS sequential but is
    * prefix-decomposable: S_t = P_t − min_{j≤t} P_j with
    * P = cumsum(x − k) — two running windows, no iteration. EXACT
    * integers throughout: x in cents, the mean never divided out
    * (work in n-scaled units: dev = n·rev − Σrev, so cusum_scaled =
    * n·S_t), flag on the pure integer compare cusum_scaled > 2·Σrev
    * (⇔ unscaled CUSUM > 2× mean daily revenue); the one double
    * division happens in the floored dollar readout.
    *
    * Scale: the series lives on the BOUNDED day domain (the ks_test
    * rationale) — the keyless windows run over ≤ |days| rows after a
    * partial-agg'd groupBy; per-key CUSUM over an unbounded key set
    * would partition the same two windows by key. */
  def cusum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w2 = Window.orderBy($"day") // bounded day domain
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
    val tot = daily.agg(count(lit(1)).as("n"), sum($"rev").as("s")) // 1 row
    daily.crossJoin(broadcast(tot))
      .withColumn("p", sum($"n" * $"rev" - $"s").over(w2))
      // the running min must include P_0 = 0 (the empty prefix) or the
      // identity S_t = P_t − min_{0≤j≤t} P_j breaks whenever P starts
      // positive — caught by the Wave12Spec textbook-recursion replay
      .withColumn("cusum_scaled", $"p" - least(min($"p").over(w2), lit(0L)))
      .select($"day", $"rev".as("rev_cents"),
        (floor($"cusum_scaled".cast("double") / $"n" / 100.0 * 1e6)
          .cast("long") / 1e6).as("cusum_dollars"),
        ($"cusum_scaled" > $"s" * 2L).cast("int").as("shift_flag"))
      .orderBy($"day")
  }

  /** q_window_drawdown — peak-to-current drawdown of the daily
    * revenue series (the risk readout paired with [[cusum]]'s shift
    * detector): per day, how far revenue sits below its historical
    * peak — drawdown_t = max_{j≤t} rev_j − rev_t — plus the new-peak
    * flag. Pure integer cents (one running max over the bounded day
    * domain, the cusum rationale), no division anywhere. */
  def drawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w2 = Window.orderBy($"day") // bounded day domain
    graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .withColumn("peak", max($"rev").over(w2))
      .select($"day", $"rev".as("rev_cents"), $"peak".as("peak_cents"),
        ($"peak" - $"rev").as("drawdown_cents"),
        ($"rev" === $"peak").cast("int").as("is_new_peak"))
      .orderBy($"day")
  }

  /** q_window_seasonal — classical additive day-of-week decomposition
    * of the daily revenue series (the decompose a monitoring pipeline
    * runs before setting anomaly thresholds): trend = centered
    * 7-observation moving average (NULL at the edges where the window
    * is short), seasonal = per-ISO-weekday mean of the DETRENDED
    * series, residual = rev − trend − seasonal. Exactness discipline:
    * rev in integer cents; the detrended series stays n-SCALED
    * (d = 7·rev − Σ₇rev, exact int64 — the acf/cusum trick) so no
    * division happens before the seasonal aggregation; each readout
    * column then divides once in double in the same operation order
    * both engines use, micro-floored dollars.
    *
    * Scale: the series lives on the BOUNDED day domain (the cusum
    * rationale) — the keyless centered window runs over ≤ |days| rows
    * after a partial-agg'd groupBy, and the ≤7-row weekday frame is
    * broadcast back. */
  def seasonal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w7 = Window.orderBy($"day").rowsBetween(-3, 3) // bounded day domain
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .withColumn("t7", sum($"rev").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("dscaled", when($"c7" === 7, $"rev" * 7L - $"t7"))
      .withColumn("dow", expr("weekday(day)") + 1) // ISO 1=Mon..7=Sun
    val seas = daily.filter($"dscaled".isNotNull)
      .groupBy($"dow")
      .agg(sum($"dscaled").as("snum"), count(lit(1)).as("scnt")) // ≤7 rows
    daily.join(broadcast(seas), Seq("dow"), "left")
      .select($"day", $"rev".as("rev_cents"), $"dow",
        when($"c7" === 7,
          floor($"t7".cast("double") / 7.0 / 100.0 * 1e6).cast("long") / 1e6)
          .as("trend_dollars"),
        (floor($"snum".cast("double") / (lit(7.0) * $"scnt") / 100.0 * 1e6)
          .cast("long") / 1e6).as("seasonal_dollars"),
        when($"c7" === 7,
          floor(($"rev" - $"t7".cast("double") / 7.0 -
            $"snum".cast("double") / (lit(7.0) * $"scnt")) / 100.0 * 1e6)
            .cast("long") / 1e6).as("residual_dollars"))
      .orderBy($"day")
  }

  /** q_window_acf — sample autocorrelation of the daily revenue
    * series at lags 1..7 (the weekly-seasonality diagnostic read
    * before choosing a resample/forecast window): r_k =
    * Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)². EXACT arithmetic via the
    * n-scaling trick: u_t = n·rev_t − Σrev makes (x_t−x̄) = u_t/n, and
    * the n's cancel in the ratio — so numerators and denominator are
    * exact DECIMAL sums of integer products (u ≤ ~5e10 → DECIMAL(12)
    * cells, DECIMAL(24) products; int64 would overflow at Σu²) and
    * the ONE double division per lag is floored at micro.
    * Scale: the series lives on the bounded day domain (the cusum
    * rationale); 7 in-frame lags, one aggregation. */
  def acf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w2 = Window.orderBy($"day") // bounded day domain
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
    val tot = daily.agg(count(lit(1)).as("nd"), sum($"rev").as("s")) // 1 row
    val u = daily.crossJoin(broadcast(tot))
      .select($"day", $"nd",
        ($"nd" * $"rev" - $"s").cast("decimal(19,0)").as("u"))
    val lagged = u.select(($"nd" +: $"u" +:
      (1 to 7).map(k => lag($"u", k).over(w2).as(s"u$k"))): _*)
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    // degenerate guard: a CONSTANT series zeroes γ₀ and every r_k is
    // 0/0 — the `when` lazily gates the division (ANSI throws on
    // double x/0), mirrored as CASE in the twin
    val aggCols = Seq(max($"nd").as("nd"), sum($"u" * $"u").as("g0")) ++
      (1 to 7).map(k => sum($"u" * col(s"u$k")).as(s"g$k"))
    lagged.agg(aggCols.head, aggCols.tail: _*)
      .select(($"nd".as("n_days") +:
        (1 to 7).map(k => when($"g0" > 0,
          micro(col(s"g$k").cast("double") / $"g0".cast("double")))
          .as(s"acf_$k"))): _*)
  }

  /** q_window_newey_west — HAC (heteroskedasticity-and-autocorrelation
    * consistent) standard error of the mean daily revenue (Newey &
    * West, Econometrica 1987) with Bartlett weights w_k = 1 − k/(L+1),
    * L = 7: the naive se = √(γ₀/n) silently assumes i.i.d. days; when
    * days autocorrelate, every corpus-level "revenue ± se" readout is
    * overconfident by exactly the ratio this query reports. Exactness
    * via the acf n-scaling trick: u_t = n·x_t − Σx makes every
    * autocovariance numerator Σu_t·u_{t−k} an exact DECIMAL sum
    * (γ_k = Σuu′/n³), and the Bartlett combination + two square roots
    * run in double in ONE mirrored order, micro-floored.
    *
    * Scale: the series lives on the bounded day domain; 7 in-frame
    * lags, one aggregation, 1-row readout. */
  def neweyWest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w2 = Window.orderBy($"day") // bounded day domain
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
    val tot = daily.agg(count(lit(1)).as("nd"), sum($"rev").as("s"))
    val u = daily.crossJoin(broadcast(tot))
      .select($"day", $"nd", $"s",
        ($"nd" * $"rev" - $"s").cast("decimal(19,0)").as("u"))
    val lagged = u.select(($"nd" +: $"s" +: $"u" +:
      (1 to 7).map(k => lag($"u", k).over(w2).as(s"u$k"))): _*)
    val aggCols = Seq(max($"nd").as("nd"), max($"s").as("s"),
      sum($"u" * $"u").as("g0")) ++
      (1 to 7).map(k => sum($"u" * col(s"u$k")).as(s"g$k"))
    val g = lagged.agg(aggCols.head, aggCols.tail: _*)
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    val n3 = $"nd".cast("double") * $"nd".cast("double") *
      $"nd".cast("double")
    // lrv = γ0 + 2·Σ w_k γ_k, all γ in the same n³ scaling
    val lrv = (1 to 7).foldLeft($"g0".cast("double") / n3) { (acc, k) =>
      acc + lit(2.0) * (lit(1.0) - lit(k.toDouble) / 8.0) *
        (col(s"g$k").cast("double") / n3)
    }
    // degenerate guard: a CONSTANT (or single-day) series zeroes every
    // u_t, so γ₀ = 0 and the ratio's denominator SE is 0 → 0/0; the
    // `when` lazily gates the DIVISION itself (ANSI throws on double
    // x/0), mirrored as CASE WHEN g0 > 0 in the twin. se_naive/se_hac
    // stay defined (0 resp. NULL-via-lag-propagation on 1 day).
    g.select($"nd".as("n_days"),
        micro($"s".cast("double") / $"nd".cast("double") / 100.0)
          .as("mean_dollars"),
        micro(sqrt($"g0".cast("double") / n3 / $"nd".cast("double")) /
          100.0).as("se_naive_dollars"),
        micro(sqrt(lrv / $"nd".cast("double")) / 100.0)
          .as("se_hac_dollars"),
        when($"g0" > 0,
          micro(sqrt(lrv / $"nd".cast("double")) /
            sqrt($"g0".cast("double") / n3 / $"nd".cast("double"))))
          .as("hac_ratio"))
  }

  /** q_window_stl_strength — seasonal/trend STRENGTH of the classical
    * decomposition (Wang, Smith & Hyndman, J. Comp. Graph. Stat.
    * 2006; the feasts/FPP3 F_s, F_t readouts): F_s = max(0,
    * 1 − Var(R)/Var(S+R)) and F_t = max(0, 1 − Var(R)/Var(T+R)) over
    * the SAME trend/seasonal/residual frames as q_window_seasonal —
    * the one-number answer to "is the weekly cycle worth modeling at
    * all". Component values are rationals; each variance term is
    * 6dp-rounded and DECIMAL-summed (order-independent across
    * partials), the two variance ratios divide in double once each,
    * micro-floored and clamped at 0 via greatest (both engines).
    *
    * Scale: identical frame discipline to q_window_seasonal — one
    * partial-agg'd daily groupBy, centered-7 windows over the bounded
    * day domain, ≤7-row seasonal frame broadcast back. 1-row
    * readout. */
  def stlStrength(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w7 = Window.orderBy($"day").rowsBetween(-3, 3)
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .withColumn("t7", sum($"rev").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("dscaled", when($"c7" === 7, $"rev" * 7L - $"t7"))
      .withColumn("dow", expr("weekday(day)") + 1)
    val seas = daily.filter($"dscaled".isNotNull)
      .groupBy($"dow")
      .agg(sum($"dscaled").as("snum"), count(lit(1)).as("scnt"))
    val comp = daily.filter($"c7" === 7)
      .join(broadcast(seas), Seq("dow"))
      .withColumn("tr", $"t7".cast("double") / 7.0)
      .withColumn("se", $"snum".cast("double") / (lit(7.0) * $"scnt"))
      .withColumn("re", $"rev".cast("double") - $"tr" - $"se")
      .select(
        round($"re", 6).cast("decimal(24,6)").as("r1"),
        round($"re" * $"re", 6).cast("decimal(30,6)").as("r2"),
        round($"se" + $"re", 6).cast("decimal(24,6)").as("sr1"),
        round(($"se" + $"re") * ($"se" + $"re"), 6)
          .cast("decimal(30,6)").as("sr2"),
        round($"tr" + $"re", 6).cast("decimal(24,6)").as("tr1"),
        round(($"tr" + $"re") * ($"tr" + $"re"), 6)
          .cast("decimal(30,6)").as("tr2"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    def varOf(s1: org.apache.spark.sql.Column, s2: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      s2.cast("double") / n.cast("double") -
        (s1.cast("double") / n.cast("double")) *
          (s1.cast("double") / n.cast("double"))
    comp.agg(count(lit(1)).as("n"), sum($"r1").as("r1"),
        sum($"r2").as("r2"), sum($"sr1").as("sr1"),
        sum($"sr2").as("sr2"), sum($"tr1").as("tr1"),
        sum($"tr2").as("tr2"))
      // degenerate guard: a CONSTANT series zeroes Var(S+R)/Var(T+R)
      // and the strength ratio is undefined → NULL; the when gates the
      // division itself (ANSI throws on x/0 even for doubles)
      .select($"n".as("n_days"),
        when(varOf($"sr1", $"sr2", $"n") > 0.0,
          micro(greatest(lit(0.0), lit(1.0) -
            varOf($"r1", $"r2", $"n") / varOf($"sr1", $"sr2", $"n"))))
          .as("f_seasonal"),
        when(varOf($"tr1", $"tr2", $"n") > 0.0,
          micro(greatest(lit(0.0), lit(1.0) -
            varOf($"r1", $"r2", $"n") / varOf($"tr1", $"tr2", $"n"))))
          .as("f_trend"))
  }

  /** q_window_variance_ratio — the Lo–MacKinlay variance-ratio test
    * (Rev. Financial Studies 1988) on the daily-revenue increment
    * series: VR(q) = Var(q-day overlapping sums)/(q·Var(1-day)) — 1
    * under i.i.d. increments, >1 persistence, <1 mean-reversion; the
    * aggregation-level companion to hurst (which fits ONE exponent;
    * VR reads the same question at each horizon q ∈ {2,5,10}).
    * Exactness: each overlapping q-sum is an exact int64 window sum
    * over the bounded day frame; variances come from the n-scaling
    * trick (u = n·x − Σx ⇒ Var = Σu²/n³ population) with Σu² in
    * DECIMAL(38,0) — no double accumulates anything; ONE micro-floored
    * division per readout row.
    *
    * Scale: the series lives on the bounded day domain (one
    * partial-agg'd groupBy); per-q window sums and two moment
    * aggregates over ≤|days| rows. 3-row readout. */
  def varianceRatio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wO = Window.orderBy($"day")
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .localCheckpoint() // bounded day frame; feeds base + 3 q-frames
    def popVarN3(df: DataFrame, c: String): DataFrame = {
      // (n, Σu²) with u = n·x − Σx: population Var = Σu²/n³ exactly
      val tot = df.agg(count(lit(1)).as("n"), sum(col(c)).as("s"))
      df.crossJoin(broadcast(tot))
        .select((($"n" * col(c) - $"s")).cast("decimal(19,0)").as("u"),
          $"n")
        .groupBy($"n").agg(sum($"u" * $"u").as("uu"))
    }
    val base = popVarN3(daily.select($"day", $"rev"), "rev")
      .select($"n".as("n1"), $"uu".as("uu1"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    val perQ = Seq(2, 5, 10).map { q =>
      val sums = daily
        .withColumn("qs", sum($"rev").over(
          wO.rowsBetween(-(q - 1), 0)))
        .withColumn("cnt", count(lit(1)).over(
          wO.rowsBetween(-(q - 1), 0)))
        .filter($"cnt" === q) // full windows only
        .select($"day", $"qs")
      popVarN3(sums, "qs")
        .select(lit(q.toLong).as("q"), $"n".as("nq"), $"uu".as("uuq"))
    }.reduce(_.unionAll(_))
    // degenerate guard: a CONSTANT series zeroes the 1-day variance
    // Σu² (uu1), making VR 0/0 — the `when` lazily gates the DIVISION
    // (ANSI throws on double x/0), mirrored as CASE in the twin.
    perQ.crossJoin(broadcast(base)) // 1-row base-variance frame
      .select($"q", $"nq".as("n_windows"),
        when($"uu1" > 0,
          micro(($"uuq".cast("double") /
            ($"nq".cast("double") * $"nq".cast("double") *
              $"nq".cast("double"))) /
            ($"q".cast("double") * ($"uu1".cast("double") /
              ($"n1".cast("double") * $"n1".cast("double") *
                $"n1".cast("double")))))).as("vr"))
      .orderBy($"q")
  }

  /** q_window_kruskal_dow — Kruskal–Wallis H test (JASA 1952) of the
    * daily-revenue distribution across the 7 weekdays: the
    * NONPARAMETRIC one-way ANOVA ("does any weekday distribute
    * revenue differently"), rank-based so outlier days can't buy
    * significance — the distribution-level companion to
    * stl_strength's variance-share readout (which found no weekly
    * cycle; this tests that finding formally). Ranks are 2-SCALED
    * average ranks over the BOUNDED day frame (ar2 = 2·rank + ties −
    * 1, the spearman recipe — exact under ties), ΣR2²/n_j terms are
    * 6dp-rounded DECIMAL sums, the tie correction Σ(t³−t)/(N³−N) is
    * exact int64, and H divides in double ONCE, micro-floored
    * (df = 6, crit 12.592).
    *
    * Scale: rank windows over ≤|days| rows post-aggregate; 7-row
    * group frame; 1-row readout. */
  def kruskalDow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .withColumn("dow", expr("weekday(day)") + 1)
      .withColumn("ar2",
        lit(2L) * rank().over(Window.orderBy($"rev")) +
          count(lit(1)).over(Window.partitionBy($"rev")) - 1L)
      .localCheckpoint() // bounded day frame; feeds groups + ties + N
    val grp = daily.groupBy($"dow")
      .agg(sum($"ar2").as("r2"), count(lit(1)).as("nj"))
      .select(round(($"r2" * $"r2").cast("double") /
        $"nj".cast("double"), 6).cast("decimal(24,6)").as("t"))
      .agg(sum($"t").as("sum_r2sq"), count(lit(1)).as("k"))
    val ties = daily.groupBy($"rev").agg(count(lit(1)).as("t"))
      .agg(sum($"t" * $"t" * $"t" - $"t").as("tcorr"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    n.crossJoin(broadcast(grp)).crossJoin(broadcast(ties)) // 1-row frames
      .withColumn("h_raw",
        lit(3.0) * $"sum_r2sq".cast("double") /
          ($"n_days" * ($"n_days" + 1L)).cast("double") -
          lit(3.0) * ($"n_days" + 1L).cast("double"))
      // degenerate guards: a 1-day series zeroes the correction's
      // denominator, an ALL-TIED series zeroes corr itself — both
      // make H 0/0; NULL is the defined readout. The n_days guard
      // wraps corr's own division (ANSI mode throws on x/0 even for
      // doubles, so the division must be lazily gated, not just its
      // consumer); `when` branches evaluate lazily in Spark, the
      // CASE twin does the same in DuckDB.
      .withColumn("corr", when($"n_days" > 1L,
        lit(1.0) - $"tcorr".cast("double") /
          ($"n_days" * $"n_days" * $"n_days" - $"n_days").cast("double")))
      // the χ²_{k−1} 0.05 critical value follows the OBSERVED group
      // count (a calendar missing weekdays has df = k_groups−1, not
      // 6) via a bounded CASE — the friedmanTest pattern; k_groups=1
      // has no between-group df, so significant is NULL with h_stat
      .withColumn("crit",
        when($"k" === 2L, 3.841).when($"k" === 3L, 5.991)
          .when($"k" === 4L, 7.815).when($"k" === 5L, 9.488)
          .when($"k" === 6L, 11.070).when($"k" === 7L, 12.592))
      .select($"n_days", $"k".as("k_groups"),
        when($"corr" > 0.0,
          micro($"h_raw" / $"corr")).as("h_stat"),
        when($"corr" > 0.0,
          micro($"h_raw" / $"corr") > $"crit").as("significant"))
  }

  /** q_window_ljung_box — the Ljung–Box portmanteau test (Biometrika
    * 1978) on the first 7 daily-revenue autocorrelations:
    * Q = n(n+2)·Σ_k r_k²/(n−k), the ONE formal joint test behind the
    * informal i.i.d. quartet (acf eyeballing, runs z, Hurst, VR) —
    * χ²₇ at 0.05 is 14.067. The r_k reuse the acf machinery exactly:
    * u = n·x − Σx makes each r_k = Σu·u_k / Σu² a ratio of exact
    * DECIMAL sums, and Q assembles the 7 terms in ONE mirrored fold
    * order, micro-floored.
    *
    * Scale: the acf shape — bounded day frame, 7 in-frame lags, one
    * aggregation, 1-row readout. */
  def ljungBox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w2 = Window.orderBy($"day")
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
    val tot = daily.agg(count(lit(1)).as("nd"), sum($"rev").as("s"))
    val u = daily.crossJoin(broadcast(tot))
      .select($"day", $"nd",
        ($"nd" * $"rev" - $"s").cast("decimal(19,0)").as("u"))
    val lagged = u.select(($"nd" +: $"u" +:
      (1 to 7).map(k => lag($"u", k).over(w2).as(s"u$k"))): _*)
    val aggCols = Seq(max($"nd").as("nd"), sum($"u" * $"u").as("g0")) ++
      (1 to 7).map(k => sum($"u" * col(s"u$k")).as(s"g$k"))
    val g = lagged.agg(aggCols.head, aggCols.tail: _*)
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    val q = (1 to 7).foldLeft(lit(0.0)) { (acc, k) =>
      acc + (col(s"g$k").cast("double") / $"g0".cast("double")) *
        (col(s"g$k").cast("double") / $"g0".cast("double")) /
        ($"nd" - k.toLong).cast("double")
    }
    // degenerate guard: a CONSTANT series zeroes γ₀ (every r_k is
    // 0/0), and nd ≤ 7 zeroes an (n−k) denominator — both gated
    // LAZILY around the division-bearing q fold (ANSI throws on
    // double x/0), mirrored as CASE in the twin. The test needs
    // n > lag count anyway, so NULL is the defined readout.
    g.select($"nd".as("n_days"),
        when($"g0" > 0 && $"nd" > 7L,
          micro($"nd".cast("double") * ($"nd" + 2L).cast("double") * q))
          .as("q_stat"),
        when($"g0" > 0 && $"nd" > 7L,
          micro($"nd".cast("double") * ($"nd" + 2L).cast("double") * q)
            > 14.067).as("significant")) // chi2 df=7
  }

  /** q_window_mann_kendall — Mann–Kendall trend test (Mann 1945,
    * Kendall 1975) + tie-corrected Kendall τ_b over the daily revenue
    * series, the NON-parametric companion to the OLS/Theil–Sen slope
    * readouts: S = Σ_{i<j} sign(rev_j − rev_i) needs no distributional
    * assumption and is immune to outlier days. EXACT integers end to
    * end: S and the tie counts are int64; the variance is kept
    * 18-SCALED (var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5), the acf
    * n-scaling idea — no /18 until the readout) so z =
    * (S ∓ 1)/√(var18/18) and τ_b = S/√(D·(D−U)) each divide ONCE in
    * double, micro-floored; the trend call compares the micro-floored
    * z against ±1.96 (identical arithmetic in the twin).
    *
    * Scale: the pair enumeration is the bounded-day-domain self-join
    * (|days|² grows with the CALENDAR, not the corpus — the ks_test /
    * cusum rationale); everything corpus-sized collapses in the one
    * partial-agg'd groupBy producing the daily frame. Per-key trend
    * tests would partition the same join by key. */
  def mannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .localCheckpoint() // bounded day domain; feeds pairs + ties + n
    val a = daily.select($"day".as("d1"), $"rev".as("r1"))
    val b = daily.select($"day".as("d2"), $"rev".as("r2"))
    val s = a.join(b, $"d1" < $"d2") // bounded |days|² pair frame
      .agg(sum(signum($"r2" - $"r1").cast("long")).as("s_stat"))
    // tie terms kept 2-SCALED (t(t−1) is even) so everything stays
    // int64: D and U enter τ_b as d0x2/2.0 and (d0x2−ux2)/2.0 — exact
    // binary halvings, no truncating division anywhere
    val ties = daily.groupBy($"rev").agg(count(lit(1)).as("t"))
      .agg(sum($"t" * ($"t" - 1L)).as("ux2"),
        sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + 5L)).as("tcorr"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    s.crossJoin(broadcast(ties)).crossJoin(broadcast(n)) // three 1-row frames
      .withColumn("var18",
        $"n_days" * ($"n_days" - 1L) * (lit(2L) * $"n_days" + 5L) - $"tcorr")
      .withColumn("d0x2", $"n_days" * ($"n_days" - 1L))
      .withColumn("z", when($"s_stat" > 0L,
          micro(($"s_stat" - 1L).cast("double") /
            sqrt($"var18".cast("double") / 18.0)))
        .when($"s_stat" < 0L,
          micro(($"s_stat" + 1L).cast("double") /
            sqrt($"var18".cast("double") / 18.0)))
        .otherwise(lit(0.0)))
      // degenerate guard: an ALL-TIED (constant) series makes τ_b's
      // D−U factor 0 (and a 1-day series zeroes D itself) → 0/0; the
      // `when` lazily gates the division (ANSI throws on double x/0),
      // CASE-mirrored in the twin
      .select($"n_days", $"s_stat", $"var18",
        when($"d0x2" > $"ux2" && $"d0x2" > 0L,
          micro($"s_stat".cast("double") /
            sqrt(($"d0x2".cast("double") / 2.0) *
              (($"d0x2" - $"ux2").cast("double") / 2.0))))
          .as("tau_b"),
        $"z".as("z_stat"),
        when($"z" >= 1.96, "increasing").when($"z" <= -1.96, "decreasing")
          .otherwise("none").as("trend"))
  }

  /** q_window_pettitt — Pettitt's changepoint test (Pettitt, JRSS-C
    * 1979) on the daily-revenue series: the rank-based U_t statistic
    * located via its V-recursion U_t = U_{t−1} + V_t with
    * V_t = Σ_{j≠t} sgn(x_t − x_j) — each day's one-vs-all sign sum
    * comes from the mannKendall |days|² pair frame, the running sum is
    * a cumsum over the BOUNDED day domain, and K = max|U_t| with the
    * earliest argmax day as the changepoint call. The approximate
    * significance p ≈ 2·exp(−6K²/(n³+n²)) (Pettitt's eq. 7) is capped
    * at 1 and micro-floored — K² ≤ (n²/2)² stays comfortably int64 at
    * any calendar. The nonparametric "did the level SHIFT and when"
    * companion to mannKendall's monotone-trend call.
    *
    * Scale: identical frame discipline to mannKendall/theil_sen — ONE
    * partial-agg'd groupBy to the day domain, a calendar-bounded (not
    * corpus-bounded) pair join, a cumsum window over ≤|days| rows, and
    * 1-row readouts cross-joined broadcast. */
  def pettitt(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .localCheckpoint() // bounded day domain; feeds both pair legs
    val a = daily.select($"day".as("d1"), $"rev".as("r1"))
    val b = daily.select($"day".as("d2"), $"rev".as("r2"))
    val u = a.join(b, $"d1" =!= $"d2") // bounded |days|² pair frame
      .groupBy($"d1")
      .agg(sum(signum($"r1" - $"r2").cast("long")).as("v"))
      .withColumn("u", sum($"v").over(Window.orderBy($"d1")))
      .localCheckpoint() // ≤|days| rows; feeds the max AND the argmax
    val k = u.agg(max(abs($"u")).as("k_stat"),
      count(lit(1)).as("n_days")) // 1-row frame
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    u.crossJoin(broadcast(k))
      .filter(abs($"u") === $"k_stat")
      .agg(first($"n_days").as("n_days"), first($"k_stat").as("k_stat"),
        min($"d1").as("change_day")) // earliest argmax day
      // degenerate guard (≤1 day ⇒ no pairs): the empty-frame global
      // agg yields one all-NULL row here while the oracle's GROUP BY
      // yields zero rows — drop it so both engines emit 0 rows
      .filter($"k_stat".isNotNull)
      .withColumn("exparg",
        lit(-6.0) * ($"k_stat" * $"k_stat").cast("double") /
          ($"n_days" * $"n_days" * ($"n_days" + 1L)).cast("double"))
      .select($"n_days", $"k_stat", $"change_day",
        micro(least(lit(1.0), lit(2.0) * exp($"exparg"))).as("p_value"),
        (micro(least(lit(1.0), lit(2.0) * exp($"exparg"))) <= 0.05)
          .as("significant"))
  }

  /** q_window_ccf — the cross-correlation function (Box & Jenkins
    * 1970 ch. 11) between daily revenue and daily order count at lags
    * 0..7: ρ_l = corr(rev_t, cnt_{t−l}), the lead/lag readout acf
    * (own-series) and spearman (contemporaneous) can't give — "do
    * busy days predict revenue days later". Per lag, Pearson runs
    * over the ALIGNED pairs only (both endpoints inside the
    * calendar), from six moments: counts/sums stay int64, every
    * cross/square product is cast DECIMAL(19,0)×DECIMAL(19,0) →
    * DECIMAL(38,0) before summing (rev·cnt crosses int64 at real
    * scale; decimal sums are also order-independent), ONE
    * micro-floored double division per lag.
    *
    * Scale: the pair frame is the mannKendall discipline — a
    * calendar-bounded band join (0 ≤ datediff ≤ 7, ~8·|days| rows),
    * one hash agg per lag. Corpus enters through the one partial-agg'd
    * daily groupBy only. */
  def ccf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"),
        count(lit(1)).as("cnt"))
      .localCheckpoint() // bounded day domain; feeds both band legs
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    val a = daily.select($"day".as("d1"), $"rev".as("x"))
    val b = daily.select($"day".as("d2"), $"cnt".as("y"))
    a.join(b, datediff($"d1", $"d2").between(0, 7)) // calendar band
      .select(datediff($"d1", $"d2").as("lag"), $"x", $"y")
      .groupBy($"lag")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(d19($"x") * d19($"y")).as("sxy"),
        sum(d19($"x") * d19($"x")).as("sxx"),
        sum(d19($"y") * d19($"y")).as("syy"))
      // degenerate guard: a constant series (either side) zeroes its
      // variance term within a lag group — the correlation is
      // undefined, and the `when` lazily gates the division (ANSI
      // throws on double x/0), CASE-mirrored in the twin
      .select($"lag".cast("long").as("lag"), $"n",
        when(($"n".cast("double") * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")) > 0.0 &&
          ($"n".cast("double") * $"syy".cast("double") -
            $"sy".cast("double") * $"sy".cast("double")) > 0.0,
          micro(($"n".cast("double") * $"sxy".cast("double") -
            $"sx".cast("double") * $"sy".cast("double")) /
            (sqrt($"n".cast("double") * $"sxx".cast("double") -
              $"sx".cast("double") * $"sx".cast("double")) *
             sqrt($"n".cast("double") * $"syy".cast("double") -
              $"sy".cast("double") * $"sy".cast("double")))))
          .as("ccf"))
      .orderBy($"lag")
  }

  /** q_window_runs_test — the Wald–Wolfowitz runs test (Ann. Math.
    * Stat. 1940) for randomness of the daily-revenue series around
    * its MEDIAN: days above/below the (lower) median form a ±
    * sequence; too few runs means level persistence (regimes), too
    * many means oscillation — the model-free "is this series i.i.d."
    * gate read before trusting any i.i.d.-assuming statistic on it.
    * Median-equal days drop (the standard treatment); R counts sign
    * changes via ONE lag over the bounded day frame; μ_R, σ_R from
    * the exact n1/n2 formulas (products stay int64 — counts are
    * calendar-bounded by construction); z micro-floored once.
    *
    * Scale: the median comes from a rank over the BOUNDED day frame
    * (post-aggregate), not the corpus; everything downstream is
    * 1-row. */
  def runsTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"day")
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .localCheckpoint() // bounded day domain; feeds median + signs
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy($"rev", $"day")))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("nd"))))
      .filter($"rn" === expr("(nd + 1L) div 2L")) // lower median
      .select($"rev".as("median_rev"))
    val signs = daily.crossJoin(broadcast(med))
      .filter($"rev" =!= $"median_rev") // standard: drop exact-median
      .select($"day", ($"rev" > $"median_rev").cast("long").as("s"))
    val runs = signs
      .withColumn("chg",
        when(lag($"s", 1).over(w).isNull ||
          lag($"s", 1).over(w) =!= $"s", 1L).otherwise(0L))
      .agg(sum($"chg").as("r"), sum($"s").as("n1"),
        sum(lit(1L) - $"s").as("n2"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    // degenerate guards: a ONE-SIDED sign sequence (n1=0 or n2=0 —
    // e.g. a 2-day series where the median day drops) zeroes σ²'s
    // (n1+n2−1) denominator, and n1=n2=1 zeroes σ² itself — both make
    // z 0/0; the `when`s lazily gate each DIVISION (ANSI throws on
    // double x/0), CASE-mirrored in the twin
    runs
      .withColumn("mu", lit(2.0) * ($"n1" * $"n2").cast("double") /
        ($"n1" + $"n2").cast("double") + lit(1.0))
      .withColumn("s2", when($"n1" > 0L && $"n2" > 0L,
        lit(2.0) * ($"n1" * $"n2").cast("double") *
        (lit(2L) * $"n1" * $"n2" - $"n1" - $"n2").cast("double") /
        ((($"n1" + $"n2") * ($"n1" + $"n2")).cast("double") *
          ($"n1" + $"n2" - 1L).cast("double"))))
      .select($"n1", $"n2", $"r".as("n_runs"), micro($"mu").as("mu_runs"),
        when($"s2" > 0.0,
          micro(($"r".cast("double") - $"mu") / sqrt($"s2")))
          .as("z_stat"),
        when($"s2" > 0.0,
          abs(micro(($"r".cast("double") - $"mu") / sqrt($"s2"))) > 1.96)
          .as("significant"))
  }

  /** q_window_hurst — rescaled-range (R/S) Hurst exponent (Hurst,
    * Trans. ASCE 1951; Mandelbrot & Wallis 1969) of the daily-revenue
    * series: for block sizes s ∈ {16,32,64,128} the series splits
    * into full blocks, each block reads R = range of its cumulative
    * mean-deviations and S = its population SD, and H is the log-log
    * OLS slope of mean(R/S) on s — H ≈ 0.5 random walk/noise,
    * H > 0.5 long-range persistence (trending regimes), H < 0.5
    * mean-reversion: whether history helps at all, before any
    * forecasting op is trusted. Numerics: block sums exact int64,
    * block Σx² in DECIMAL(38,0) (cents² × 128 crosses int64), R/S
    * terms and the four log points 6dp-rounded and DECIMAL-summed
    * (order-independent), the final slope ONE double expression
    * mirrored verbatim; zero-variance blocks drop on BOTH sides.
    *
    * Scale: everything beyond the one partial-agg'd daily groupBy
    * runs on the bounded day frame ×4 sizes — block windows partition
    * by (size, block). Readout: 4 rows + the constant H column. */
  def hurst(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"))
      .withColumn("idx",
        row_number().over(Window.orderBy($"day")).cast("long"))
      .localCheckpoint() // bounded day domain, indexed once
    val rows = daily.crossJoin(
        spark.range(4).select(
          expr("shiftleft(16L, cast(id as int))").as("bs"))) // 16..128
      .withColumn("blk", expr("(idx - 1L) div bs"))
    val wP = Window.partitionBy($"bs", $"blk")
    val wO = wP.orderBy($"idx")
    val scored = rows
      .withColumn("n", count(lit(1)).over(wP))
      .filter($"n" === $"bs") // full blocks only
      .withColumn("tot", sum($"rev").over(wP))
      .withColumn("ssq",
        sum($"rev".cast("decimal(19,0)") * $"rev".cast("decimal(19,0)"))
          .over(wP)) // cents² sums cross int64 — DECIMAL(38,0)
      .withColumn("cum", sum($"rev").over(
        wO.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("pos", row_number().over(wO).cast("long"))
      .withColumn("mu", $"tot".cast("double") / $"bs".cast("double"))
      .withColumn("dev", $"cum".cast("double") -
        $"pos".cast("double") * $"mu")
    val blocks = scored.groupBy($"bs", $"blk")
      .agg((max($"dev") - min($"dev")).as("r"),
        first($"ssq").as("ssq"), first($"mu").as("mu"))
      .withColumn("sd", sqrt(
        $"ssq".cast("double") / $"bs".cast("double") - $"mu" * $"mu"))
      .filter($"sd" > 0.0)
      .select($"bs",
        round($"r" / $"sd", 6).cast("decimal(18,6)").as("rs"))
    val bySize = blocks.groupBy($"bs")
      .agg(count(lit(1)).as("n_blocks"), sum($"rs").as("rs_sum"))
      .withColumn("mean_rs",
        $"rs_sum".cast("double") / $"n_blocks".cast("double"))
      .localCheckpoint() // 4 rows; feeds the slope AND the readout
    val pts = bySize.select(
      round(log($"bs".cast("double")), 6).cast("decimal(18,6)").as("x"),
      round(log($"mean_rs"), 6).cast("decimal(18,6)").as("y"),
      round(log($"bs".cast("double")) * log($"mean_rs"), 6)
        .cast("decimal(18,6)").as("xy"),
      round(log($"bs".cast("double")) * log($"bs".cast("double")), 6)
        .cast("decimal(18,6)").as("xx"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    // degenerate guard: a 16–31-day series yields full blocks at ONE
    // size only, so the log-log OLS denominator k·Σxx − (Σx)² is
    // exactly 0 → 0/0; the `when` lazily gates the DIVISION (ANSI
    // throws on double x/0), mirrored as CASE in the twin. H needs
    // ≥2 sizes to be a slope at all, so NULL is the defined readout.
    val slope = pts.agg(count(lit(1)).as("k"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"xy").as("sxy"), sum($"xx").as("sxx"))
      .select(when($"k" >= 2L &&
        ($"k".cast("double") * $"sxx".cast("double") -
          $"sx".cast("double") * $"sx".cast("double")) > 0.0,
        micro(($"k".cast("double") * $"sxy".cast("double") -
          $"sx".cast("double") * $"sy".cast("double")) /
          ($"k".cast("double") * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")))).as("hurst"))
    bySize.select($"bs".as("block_size"), $"n_blocks",
        micro($"mean_rs").as("mean_rs"))
      .crossJoin(broadcast(slope)) // 1-row slope frame
      .orderBy($"block_size")
  }

  /** q_window_spearman — Spearman rank correlation between the daily
    * revenue and daily order-count series (Spearman 1904), the
    * monotone-association companion to [[mannKendall]]'s trend test:
    * "do big-revenue days have many orders" without assuming
    * linearity. TIE-SAFE: each series gets average ranks kept
    * 2-SCALED as exact integers (ar2 = 2·minrank + t − 1, t = the
    * value's tie count — order counts tie constantly, and the naive
    * 1−6Σd²/… shortcut is simply wrong under ties), then ρ = Pearson
    * over the integer (ar2x, ar2y) pairs from six exact int64
    * moments, ONE micro-floored double division. A raw Pearson r of
    * the original series ships alongside — the ρ-vs-r gap is the
    * nonlinearity readout.
    *
    * Scale: both rank windows run over the BOUNDED day domain after
    * the one partial-agg'd groupBy (the cusum rationale); the moment
    * pass is a 1-row aggregate. */
  def spearman(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = graft.Tables.orders(spark, sfDir)
      .select(to_date($"o_orderdate").as("day"),
        (AggOps.dec($"o_totalprice") * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("rev"),
        count(lit(1)).as("cnt"))
    // rank() is min-rank; 2·minrank + t − 1 == the 2-scaled average
    // rank (exact integers, no halves)
    def ar2(v: org.apache.spark.sql.Column, name: String) =
      (lit(2L) * rank().over(Window.orderBy(v)) +
        count(lit(1)).over(Window.partitionBy(v)) - 1L).as(name)
    val ranked = daily.select($"rev", $"cnt",
      ar2($"rev", "ax"), ar2($"cnt", "ay"))
    // moments as EXACT decimal sums (daily-rev² in cents overflows
    // int64 past ~sf0.05); every readout casts each sum to double
    // ONCE and assembles in the same operation order as the twin
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val g = ranked.agg(count(lit(1)).as("nd"),
      sum(d($"rev")).as("sx"), sum(d($"cnt")).as("sy"),
      sum(d($"rev") * d($"cnt")).as("sxy"),
      sum(d($"rev") * d($"rev")).as("sxx"),
      sum(d($"cnt") * d($"cnt")).as("syy"),
      sum(d($"ax")).as("rx"), sum(d($"ay")).as("ry"),
      sum(d($"ax") * d($"ay")).as("rxy"),
      sum(d($"ax") * d($"ax")).as("rxx"),
      sum(d($"ay") * d($"ay")).as("ryy"))
    def micro(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 1e6).cast("long") / 1e6
    // degenerate guard: a constant series (or all-tied ranks) zeroes
    // a variance factor — correlation undefined; the `when` lazily
    // gates the division (ANSI throws on double x/0), CASE-mirrored
    def corr2(sx: String, sy: String, sxy: String, sxx: String,
              syy: String) = {
      def D(n: String) = col(n).cast("double")
      when(($"nd" * D(sxx) - D(sx) * D(sx)) > 0.0 &&
          ($"nd" * D(syy) - D(sy) * D(sy)) > 0.0,
        micro(($"nd" * D(sxy) - D(sx) * D(sy)) /
          (sqrt($"nd" * D(sxx) - D(sx) * D(sx)) *
            sqrt($"nd" * D(syy) - D(sy) * D(sy)))))
    }
    g.select($"nd".as("n_days"),
      corr2("sx", "sy", "sxy", "sxx", "syy").as("pearson_r"),
      corr2("rx", "ry", "rxy", "rxx", "ryy").as("spearman_rho"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_spearman" -> (spearman _),
    "q_window_mann_kendall" -> (mannKendall _),
    "q_window_pettitt" -> (pettitt _),
    "q_window_ccf" -> (ccf _),
    "q_window_runs_test" -> (runsTest _),
    "q_window_hurst" -> (hurst _),
    "q_window_newey_west" -> (neweyWest _),
    "q_window_stl_strength" -> (stlStrength _),
    "q_window_variance_ratio" -> (varianceRatio _),
    "q_window_kruskal_dow" -> (kruskalDow _),
    "q_window_ljung_box" -> (ljungBox _),
    "q_window_acf" -> (acf _),
    "q_window_drawdown" -> (drawdown _),
    "q_window_cusum" -> (cusum _),
    "q_window_seasonal" -> (seasonal _),
    "q_window_ewma" -> (ewma _),
    "q_window_anomaly_zscore" -> (anomalyZscore _),
    "q_window_attribution" -> (attribution _),
    "q_window_transitions" -> (transitions _),
    "q_window_rfm_segments" -> (rfmSegments _),
    "q_window_event_funnel" -> (eventFunnel _),
    "q_window_resample_gapfill" -> (resampleGapfill _),
    "q_window_moving_avg" -> (movingAvg _),
    "q_window_distribution" -> (distribution _),
    "q_window_ranking" -> (ranking _),
    "q_window_analytic" -> (analytic _),
    "q_window_running_sum" -> (runningSum _),
    "q_window_range_frame" -> (rangeFrame _))

  /** DuckDB twin of [[ewma]]: the same 16 lag terms (generated, not
    * hand-typed) — integer-exact doubles, see the query scaladoc. */
  private def ewmaSql: String = {
    val terms = (0 until 16).map(i =>
      s"COALESCE(lag(o_totalprice, $i) OVER w, 0) * ${(1L << (15 - i)).toDouble}")
      .mkString(" + ")
    s"""WITH l AS (
       |  SELECT o_custkey, o_orderkey, o_orderdate,
       |    $terms AS wsum,
       |    LEAST(ROW_NUMBER() OVER w, 16) AS m
       |  FROM orders
       |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
       |SELECT o_custkey, o_orderkey, o_orderdate,
       |  CAST(floor(wsum / (65536.0 - power(2, 16 - m)) * 1e6) AS BIGINT)
       |    / 1e6 AS ewma
       |FROM l ORDER BY o_custkey, o_orderkey""".stripMargin
  }

  /** DuckDB twin of [[acf]] (generated lag list). */
  private def acfSql: String = {
    val lagDefs = (1 to 7).map(k =>
      s"lag(u, $k) OVER (ORDER BY day) AS u$k").mkString(",\n    ")
    val gs = (1 to 7).map(k =>
      s"CAST(SUM(u * u$k) AS DECIMAL(38,0)) AS g$k").mkString(",\n  ")
    val cols = (1 to 7).map(k =>
      s"CASE WHEN g0 > 0 THEN CAST(floor(CAST(g$k AS DOUBLE) / " +
        s"CAST(g0 AS DOUBLE) * 1e6) AS BIGINT) / 1e6 END AS acf_$k")
      .mkString(",\n  ")
    s"""WITH d AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders GROUP BY 1),
       |t AS (SELECT COUNT(*) AS nd, CAST(SUM(rev) AS BIGINT) AS s FROM d),
       |u AS (
       |  SELECT day, nd, CAST(nd * rev - s AS DECIMAL(19,0)) AS u
       |  FROM d CROSS JOIN t),
       |l AS (
       |  SELECT nd, u,
       |    $lagDefs
       |  FROM u),
       |g AS (
       |  SELECT MAX(nd) AS n_days,
       |    CAST(SUM(u * u) AS DECIMAL(38,0)) AS g0,
       |  $gs
       |  FROM l)
       |SELECT n_days,
       |  $cols
       |FROM g""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "q_window_acf" -> acfSql,
    "q_window_drawdown" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, rev AS rev_cents,
        |  CAST(MAX(rev) OVER (ORDER BY day) AS BIGINT) AS peak_cents,
        |  CAST(MAX(rev) OVER (ORDER BY day) - rev AS BIGINT)
        |    AS drawdown_cents,
        |  CAST(CASE WHEN rev = MAX(rev) OVER (ORDER BY day)
        |    THEN 1 ELSE 0 END AS INT) AS is_new_peak
        |FROM d ORDER BY day""".stripMargin,
    "q_window_seasonal" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev,
        |    CAST(SUM(rev) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS t7,
        |    COUNT(*) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7,
        |    isodow(day) AS dow
        |  FROM daily),
        |w2 AS (SELECT *, CASE WHEN c7 = 7 THEN rev * 7 - t7 END AS dscaled
        |  FROM w),
        |seas AS (
        |  SELECT dow, CAST(SUM(dscaled) AS BIGINT) AS snum,
        |    COUNT(*) AS scnt
        |  FROM w2 WHERE dscaled IS NOT NULL GROUP BY 1)
        |SELECT w2.day, w2.rev AS rev_cents, w2.dow,
        |  CASE WHEN c7 = 7 THEN CAST(floor(CAST(t7 AS DOUBLE) / 7.0
        |    / 100.0 * 1e6) AS BIGINT) / 1e6 END AS trend_dollars,
        |  CAST(floor(CAST(snum AS DOUBLE) / (7.0 * scnt) / 100.0 * 1e6)
        |    AS BIGINT) / 1e6 AS seasonal_dollars,
        |  CASE WHEN c7 = 7 THEN CAST(floor((w2.rev
        |    - CAST(t7 AS DOUBLE) / 7.0
        |    - CAST(snum AS DOUBLE) / (7.0 * scnt)) / 100.0 * 1e6)
        |    AS BIGINT) / 1e6 END AS residual_dollars
        |FROM w2 LEFT JOIN seas USING (dow)
        |ORDER BY w2.day""".stripMargin,
    "q_window_spearman" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev,
        |    COUNT(*) AS cnt
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT rev, cnt,
        |    2 * rank() OVER (ORDER BY rev) +
        |      count(*) OVER (PARTITION BY rev) - 1 AS ax,
        |    2 * rank() OVER (ORDER BY cnt) +
        |      count(*) OVER (PARTITION BY cnt) - 1 AS ay
        |  FROM d),
        |g AS (
        |  SELECT COUNT(*) AS nd,
        |    SUM(CAST(rev AS DECIMAL(19,0))) AS sx,
        |    SUM(CAST(cnt AS DECIMAL(19,0))) AS sy,
        |    SUM(CAST(rev AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
        |      AS sxy,
        |    SUM(CAST(rev AS DECIMAL(19,0)) * CAST(rev AS DECIMAL(19,0)))
        |      AS sxx,
        |    SUM(CAST(cnt AS DECIMAL(19,0)) * CAST(cnt AS DECIMAL(19,0)))
        |      AS syy,
        |    SUM(CAST(ax AS DECIMAL(19,0))) AS rx,
        |    SUM(CAST(ay AS DECIMAL(19,0))) AS ry,
        |    SUM(CAST(ax AS DECIMAL(19,0)) * CAST(ay AS DECIMAL(19,0)))
        |      AS rxy,
        |    SUM(CAST(ax AS DECIMAL(19,0)) * CAST(ax AS DECIMAL(19,0)))
        |      AS rxx,
        |    SUM(CAST(ay AS DECIMAL(19,0)) * CAST(ay AS DECIMAL(19,0)))
        |      AS ryy
        |  FROM r)
        |SELECT nd AS n_days,
        |  CASE WHEN nd * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        |    AND nd * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
        |  THEN
        |    CAST(floor((nd * CAST(sxy AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (sqrt(nd * CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(nd * CAST(syy AS DOUBLE) -
        |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1e6)
        |      AS BIGINT) / 1e6
        |  END AS pearson_r,
        |  CASE WHEN nd * CAST(rxx AS DOUBLE) -
        |      CAST(rx AS DOUBLE) * CAST(rx AS DOUBLE) > 0.0
        |    AND nd * CAST(ryy AS DOUBLE) -
        |      CAST(ry AS DOUBLE) * CAST(ry AS DOUBLE) > 0.0
        |  THEN
        |    CAST(floor((nd * CAST(rxy AS DOUBLE) -
        |        CAST(rx AS DOUBLE) * CAST(ry AS DOUBLE)) /
        |      (sqrt(nd * CAST(rxx AS DOUBLE) -
        |          CAST(rx AS DOUBLE) * CAST(rx AS DOUBLE)) *
        |       sqrt(nd * CAST(ryy AS DOUBLE) -
        |          CAST(ry AS DOUBLE) * CAST(ry AS DOUBLE))) * 1e6)
        |      AS BIGINT) / 1e6
        |  END AS spearman_rho
        |FROM g""".stripMargin,
    "q_window_newey_west" -> {
      val lags = (1 to 7).map(k =>
        s"LAG(u, $k) OVER (ORDER BY day) AS u$k").mkString(",\n|    ")
      val gs = (1 to 7).map(k =>
        s"CAST(SUM(u * u$k) AS DECIMAL(38,0)) AS g$k").mkString(",\n|    ")
      val lrv = (1 to 7).foldLeft("CAST(g0 AS DOUBLE) / n3") { (acc, k) =>
        s"$acc + 2.0 * (1.0 - $k.0 / 8.0) * (CAST(g$k AS DOUBLE) / n3)"
      }
      s"""WITH d AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         |               CAST(SUM(rev) AS BIGINT) AS s FROM d),
         |u AS (
         |  SELECT day, nd, s,
         |    CAST(nd * rev - s AS DECIMAL(19,0)) AS u
         |  FROM d, tot),
         |lagd AS (
         |  SELECT nd, s, u,
         |    $lags
         |  FROM u),
         |g AS (
         |  SELECT MAX(nd) AS nd, MAX(s) AS s,
         |    CAST(SUM(u * u) AS DECIMAL(38,0)) AS g0,
         |    $gs
         |  FROM lagd),
         |e AS (
         |  SELECT g.*,
         |    CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE) *
         |      CAST(nd AS DOUBLE) AS n3
         |  FROM g),
         |f AS (
         |  SELECT nd, s, g0, n3, $lrv AS lrv
         |  FROM e)
         |SELECT nd AS n_days,
         |  CAST(floor(CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) / 100.0
         |    * 1e6) AS BIGINT) / 1e6 AS mean_dollars,
         |  CAST(floor(sqrt(CAST(g0 AS DOUBLE) / n3 /
         |    CAST(nd AS DOUBLE)) / 100.0 * 1e6) AS BIGINT) / 1e6
         |    AS se_naive_dollars,
         |  CAST(floor(sqrt(lrv / CAST(nd AS DOUBLE)) / 100.0 * 1e6)
         |    AS BIGINT) / 1e6 AS se_hac_dollars,
         |  CASE WHEN g0 > 0 THEN
         |    CAST(floor(sqrt(lrv / CAST(nd AS DOUBLE)) /
         |      sqrt(CAST(g0 AS DOUBLE) / n3 / CAST(nd AS DOUBLE)) * 1e6)
         |      AS BIGINT) / 1e6
         |  END AS hac_ratio
         |FROM f""".stripMargin
    },
    "q_window_kruskal_dow" ->
      """WITH d AS (
        |  SELECT day, rev,
        |    CAST(isodow(day) AS BIGINT) AS dow,
        |    2 * RANK() OVER (ORDER BY rev) +
        |      COUNT(*) OVER (PARTITION BY rev) - 1 AS ar2
        |  FROM (SELECT CAST(o_orderdate AS DATE) AS day,
        |      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |        AS BIGINT)) AS BIGINT) AS rev
        |    FROM orders GROUP BY 1)),
        |grp AS (
        |  SELECT CAST(SUM(t) AS DOUBLE) AS sum_r2sq,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM (SELECT CAST(round(CAST(r2 * r2 AS DOUBLE) /
        |      CAST(nj AS DOUBLE), 6) AS DECIMAL(24,6)) AS t
        |    FROM (SELECT dow, CAST(SUM(ar2) AS BIGINT) AS r2,
        |        CAST(COUNT(*) AS BIGINT) AS nj
        |      FROM d GROUP BY 1))),
        |ties AS (
        |  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tcorr
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |        FROM d GROUP BY rev)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d),
        |e AS (
        |  SELECT n_days, k,
        |    3.0 * sum_r2sq / CAST(n_days * (n_days + 1) AS DOUBLE) -
        |      3.0 * CAST(n_days + 1 AS DOUBLE) AS h_raw,
        |    CASE WHEN n_days > 1 THEN
        |      1.0 - CAST(tcorr AS DOUBLE) /
        |        CAST(n_days * n_days * n_days - n_days AS DOUBLE)
        |    END AS corr
        |  FROM n, grp, ties)
        |SELECT n_days, k AS k_groups,
        |  CASE WHEN corr > 0.0 THEN
        |    CAST(floor(h_raw / corr * 1e6) AS BIGINT) / 1e6
        |  END AS h_stat,
        |  CASE WHEN corr > 0.0 THEN
        |    CAST(floor(h_raw / corr * 1e6) AS BIGINT) / 1e6 >
        |      CASE k WHEN 2 THEN 3.841 WHEN 3 THEN 5.991
        |        WHEN 4 THEN 7.815 WHEN 5 THEN 9.488
        |        WHEN 6 THEN 11.070 WHEN 7 THEN 12.592 END
        |  END AS significant
        |FROM e""".stripMargin,
    "q_window_ljung_box" -> {
      val lags = (1 to 7).map(k =>
        s"LAG(u, $k) OVER (ORDER BY day) AS u$k").mkString(",\n|    ")
      val gs = (1 to 7).map(k =>
        s"CAST(SUM(u * u$k) AS DECIMAL(38,0)) AS g$k").mkString(",\n|    ")
      val qsum = (1 to 7).foldLeft("0.0") { (acc, k) =>
        s"$acc + (CAST(g$k AS DOUBLE) / CAST(g0 AS DOUBLE)) * " +
          s"(CAST(g$k AS DOUBLE) / CAST(g0 AS DOUBLE)) / " +
          s"CAST(nd - $k AS DOUBLE)"
      }
      s"""WITH d AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         |               CAST(SUM(rev) AS BIGINT) AS s FROM d),
         |u AS (
         |  SELECT day, nd,
         |    CAST(nd * rev - s AS DECIMAL(19,0)) AS u
         |  FROM d, tot),
         |lagd AS (
         |  SELECT nd, u,
         |    $lags
         |  FROM u),
         |g AS (
         |  SELECT MAX(nd) AS nd,
         |    CAST(SUM(u * u) AS DECIMAL(38,0)) AS g0,
         |    $gs
         |  FROM lagd),
         |f AS (
         |  SELECT nd,
         |    CASE WHEN g0 > 0 AND nd > 7 THEN
         |      CAST(nd AS DOUBLE) * CAST(nd + 2 AS DOUBLE) * ($qsum)
         |    END AS q
         |  FROM g)
         |SELECT nd AS n_days,
         |  CAST(floor(q * 1e6) AS BIGINT) / 1e6 AS q_stat,
         |  CAST(floor(q * 1e6) AS BIGINT) / 1e6 > 14.067 AS significant
         |FROM f""".stripMargin
    },
    "q_window_variance_ratio" -> {
      val qCases = Seq(2, 5, 10).map { q =>
        s"""q$q AS (
           |  SELECT CAST($q AS BIGINT) AS q, day,
           |    CAST(SUM(rev) OVER (ORDER BY day
           |      ROWS BETWEEN ${q - 1} PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS qs,
           |    COUNT(*) OVER (ORDER BY day
           |      ROWS BETWEEN ${q - 1} PRECEDING AND CURRENT ROW) AS c
           |  FROM d),
           |v$q AS (
           |  SELECT q, CAST(COUNT(*) AS BIGINT) AS nq,
           |    CAST(SUM(CAST(n * qs - s AS DECIMAL(19,0)) *
           |      CAST(n * qs - s AS DECIMAL(19,0))) AS DECIMAL(38,0))
           |      AS uuq
           |  FROM (SELECT q, qs,
           |      CAST(COUNT(*) OVER () AS BIGINT) AS n,
           |      CAST(SUM(qs) OVER () AS BIGINT) AS s
           |    FROM q$q WHERE c = $q)
           |  GROUP BY q)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
         |      AS BIGINT)) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |base AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n1,
         |    CAST(SUM(CAST(n * rev - s AS DECIMAL(19,0)) *
         |      CAST(n * rev - s AS DECIMAL(19,0))) AS DECIMAL(38,0))
         |      AS uu1
         |  FROM (SELECT rev, CAST(COUNT(*) OVER () AS BIGINT) AS n,
         |      CAST(SUM(rev) OVER () AS BIGINT) AS s FROM d)),
         |$qCases,
         |allq AS (SELECT * FROM v2 UNION ALL SELECT * FROM v5
         |         UNION ALL SELECT * FROM v10)
         |SELECT q, nq AS n_windows,
         |  CASE WHEN uu1 > 0 THEN
         |    CAST(floor((CAST(uuq AS DOUBLE) /
         |      (CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE) *
         |        CAST(nq AS DOUBLE))) /
         |      (CAST(q AS DOUBLE) * (CAST(uu1 AS DOUBLE) /
         |        (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) *
         |          CAST(n1 AS DOUBLE)))) * 1e6) AS BIGINT) / 1e6
         |  END AS vr
         |FROM allq, base ORDER BY q""".stripMargin
    },
    "q_window_stl_strength" ->
      """WITH d AS (
        |  SELECT day, rev,
        |    SUM(rev) OVER w7 AS t7, COUNT(*) OVER w7 AS c7,
        |    CAST(isodow(day) AS BIGINT) AS dow
        |  FROM (SELECT CAST(o_orderdate AS DATE) AS day,
        |      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |        AS BIGINT)) AS BIGINT) AS rev
        |    FROM orders GROUP BY 1)
        |  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND
        |    3 FOLLOWING)),
        |seas AS (
        |  SELECT dow, CAST(SUM(rev * 7 - t7) AS BIGINT) AS snum,
        |    CAST(COUNT(*) AS BIGINT) AS scnt
        |  FROM d WHERE c7 = 7 GROUP BY 1),
        |comp AS (
        |  SELECT
        |    CAST(rev AS DOUBLE) - tr - se AS re, tr, se
        |  FROM (SELECT rev,
        |      CAST(t7 AS DOUBLE) / 7.0 AS tr,
        |      CAST(snum AS DOUBLE) / (7.0 * scnt) AS se
        |    FROM d JOIN seas USING (dow) WHERE c7 = 7)),
        |terms AS (
        |  SELECT
        |    CAST(round(re, 6) AS DECIMAL(24,6)) AS r1,
        |    CAST(round(re * re, 6) AS DECIMAL(30,6)) AS r2,
        |    CAST(round(se + re, 6) AS DECIMAL(24,6)) AS sr1,
        |    CAST(round((se + re) * (se + re), 6) AS DECIMAL(30,6))
        |      AS sr2,
        |    CAST(round(tr + re, 6) AS DECIMAL(24,6)) AS tr1,
        |    CAST(round((tr + re) * (tr + re), 6) AS DECIMAL(30,6))
        |      AS tr2
        |  FROM comp),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(r1) AS DOUBLE) AS r1, CAST(SUM(r2) AS DOUBLE)
        |      AS r2,
        |    CAST(SUM(sr1) AS DOUBLE) AS sr1, CAST(SUM(sr2) AS DOUBLE)
        |      AS sr2,
        |    CAST(SUM(tr1) AS DOUBLE) AS tr1, CAST(SUM(tr2) AS DOUBLE)
        |      AS tr2
        |  FROM terms)
        |SELECT n AS n_days,
        |  CASE WHEN sr2 / n - (sr1 / n) * (sr1 / n) > 0.0 THEN
        |    CAST(floor(greatest(0.0, 1.0 -
        |      (r2 / n - (r1 / n) * (r1 / n)) /
        |      (sr2 / n - (sr1 / n) * (sr1 / n))) * 1e6) AS BIGINT)
        |      / 1e6
        |  END AS f_seasonal,
        |  CASE WHEN tr2 / n - (tr1 / n) * (tr1 / n) > 0.0 THEN
        |    CAST(floor(greatest(0.0, 1.0 -
        |      (r2 / n - (r1 / n) * (r1 / n)) /
        |      (tr2 / n - (tr1 / n) * (tr1 / n))) * 1e6) AS BIGINT)
        |      / 1e6
        |  END AS f_trend
        |FROM agg""".stripMargin,
    "q_window_hurst" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |di AS (
        |  SELECT rev,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM d),
        |sz AS (SELECT CAST(unnest([16, 32, 64, 128]) AS BIGINT) AS bs),
        |rows_ AS (
        |  SELECT bs, (idx - 1) // bs AS blk, idx, rev FROM di, sz),
        |full_ AS (
        |  SELECT * FROM (
        |    SELECT *, COUNT(*) OVER (PARTITION BY bs, blk) AS n
        |    FROM rows_)
        |  WHERE n = bs),
        |sc AS (
        |  SELECT bs, blk,
        |    CAST(SUM(rev) OVER (PARTITION BY bs, blk) AS BIGINT) AS tot,
        |    CAST(SUM(CAST(rev AS DECIMAL(19,0)) *
        |        CAST(rev AS DECIMAL(19,0)))
        |      OVER (PARTITION BY bs, blk) AS DECIMAL(38,0)) AS ssq,
        |    CAST(SUM(rev) OVER (PARTITION BY bs, blk ORDER BY idx)
        |      AS BIGINT) AS cum,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY bs, blk ORDER BY idx)
        |      AS BIGINT) AS pos
        |  FROM full_),
        |dev AS (
        |  SELECT bs, blk, ssq,
        |    CAST(tot AS DOUBLE) / CAST(bs AS DOUBLE) AS mu,
        |    CAST(cum AS DOUBLE) - CAST(pos AS DOUBLE) *
        |      (CAST(tot AS DOUBLE) / CAST(bs AS DOUBLE)) AS dv
        |  FROM sc),
        |blocks AS (
        |  SELECT bs, blk, MAX(dv) - MIN(dv) AS r,
        |    MIN(ssq) AS ssq, MIN(mu) AS mu
        |  FROM dev GROUP BY 1, 2),
        |rs AS (
        |  SELECT bs,
        |    CAST(round(r / sqrt(CAST(ssq AS DOUBLE) /
        |      CAST(bs AS DOUBLE) - mu * mu), 6) AS DECIMAL(18,6)) AS rs
        |  FROM blocks
        |  WHERE sqrt(CAST(ssq AS DOUBLE) / CAST(bs AS DOUBLE) - mu * mu)
        |    > 0.0),
        |m AS (
        |  SELECT bs, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(CAST(SUM(rs) AS DECIMAL(18,6)) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS mean_rs
        |  FROM rs GROUP BY 1),
        |pts AS (
        |  SELECT
        |    CAST(round(ln(CAST(bs AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(mean_rs), 6) AS DECIMAL(18,6)) AS y,
        |    CAST(round(ln(CAST(bs AS DOUBLE)) * ln(mean_rs), 6)
        |      AS DECIMAL(18,6)) AS xy,
        |    CAST(round(ln(CAST(bs AS DOUBLE)) * ln(CAST(bs AS DOUBLE)),
        |      6) AS DECIMAL(18,6)) AS xx
        |  FROM m),
        |slope AS (
        |  SELECT CASE WHEN COUNT(*) >= 2 AND
        |      CAST(COUNT(*) AS DOUBLE) * CAST(SUM(xx) AS DOUBLE) -
        |        CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) > 0.0
        |    THEN
        |      CAST(floor((CAST(COUNT(*) AS DOUBLE) *
        |          CAST(SUM(xy) AS DOUBLE) -
        |          CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)) /
        |        (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(xx) AS DOUBLE) -
        |          CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) * 1e6)
        |        AS BIGINT) / 1e6
        |    END AS hurst
        |  FROM pts)
        |SELECT bs AS block_size, n_blocks,
        |  CAST(floor(mean_rs * 1e6) AS BIGINT) / 1e6 AS mean_rs, hurst
        |FROM m, slope ORDER BY block_size""".stripMargin,
    "q_window_ccf" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT CAST(datediff('day', b.day, a.day) AS BIGINT) AS lag,
        |    a.rev AS x, b.cnt AS y
        |  FROM d a JOIN d b
        |    ON datediff('day', b.day, a.day) BETWEEN 0 AND 7),
        |m AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS sxy,
        |    CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS sxx,
        |    CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS syy
        |  FROM p GROUP BY 1)
        |SELECT lag, n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
        |  THEN
        |    CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |      (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |       sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1e6)
        |      AS BIGINT) / 1e6
        |  END AS ccf
        |FROM m ORDER BY lag""".stripMargin,
    "q_window_runs_test" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |med AS (
        |  SELECT rev AS median_rev
        |  FROM (SELECT rev,
        |      ROW_NUMBER() OVER (ORDER BY rev, day) AS rn,
        |      COUNT(*) OVER () AS nd
        |    FROM d)
        |  WHERE rn = (nd + 1) // 2),
        |signs AS (
        |  SELECT day, CASE WHEN rev > median_rev THEN 1 ELSE 0 END AS s
        |  FROM d, med WHERE rev <> median_rev),
        |runs AS (
        |  SELECT CAST(SUM(chg) AS BIGINT) AS r,
        |    CAST(SUM(s) AS BIGINT) AS n1,
        |    CAST(SUM(1 - s) AS BIGINT) AS n2
        |  FROM (SELECT s, CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
        |      OR LAG(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END
        |      AS chg
        |    FROM signs)),
        |s2 AS (
        |  SELECT n1, n2, r,
        |    2.0 * CAST(n1 * n2 AS DOUBLE) /
        |      CAST(n1 + n2 AS DOUBLE) + 1.0 AS mu,
        |    CASE WHEN n1 > 0 AND n2 > 0 THEN
        |      2.0 * CAST(n1 * n2 AS DOUBLE) *
        |        CAST(2 * n1 * n2 - n1 - n2 AS DOUBLE) /
        |        (CAST((n1 + n2) * (n1 + n2) AS DOUBLE) *
        |          CAST(n1 + n2 - 1 AS DOUBLE))
        |    END AS v
        |  FROM runs)
        |SELECT n1, n2, r AS n_runs,
        |  CAST(floor(mu * 1e6) AS BIGINT) / 1e6 AS mu_runs,
        |  CASE WHEN v > 0.0 THEN
        |    CAST(floor((CAST(r AS DOUBLE) - mu) / sqrt(v) * 1e6)
        |      AS BIGINT) / 1e6
        |  END AS z_stat,
        |  CASE WHEN v > 0.0 THEN
        |    abs(CAST(floor((CAST(r AS DOUBLE) - mu) / sqrt(v) * 1e6)
        |      AS BIGINT) / 1e6) > 1.96
        |  END AS significant
        |FROM s2""".stripMargin,
    "q_window_pettitt" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |v AS (
        |  SELECT a.day AS d1,
        |    CAST(SUM(CAST(sign(a.rev - b.rev) AS BIGINT)) AS BIGINT) AS v
        |  FROM d a JOIN d b ON a.day <> b.day GROUP BY 1),
        |u AS (
        |  SELECT d1, CAST(SUM(v) OVER (ORDER BY d1) AS BIGINT) AS u
        |  FROM v),
        |k AS (
        |  SELECT CAST(MAX(abs(u)) AS BIGINT) AS k_stat,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM u),
        |arg AS (
        |  SELECT n_days, k_stat, MIN(d1) AS change_day,
        |    -6.0 * CAST(k_stat * k_stat AS DOUBLE) /
        |      CAST(n_days * n_days * (n_days + 1) AS DOUBLE) AS exparg
        |  FROM u, k WHERE abs(u) = k_stat GROUP BY 1, 2)
        |SELECT n_days, k_stat, change_day,
        |  CAST(floor(least(1.0, 2.0 * exp(exparg)) * 1e6) AS BIGINT)
        |    / 1e6 AS p_value,
        |  CAST(floor(least(1.0, 2.0 * exp(exparg)) * 1e6) AS BIGINT)
        |    / 1e6 <= 0.05 AS significant
        |FROM arg""".stripMargin,
    "q_window_mann_kendall" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT CAST(SUM(CAST(sign(b.rev - a.rev) AS BIGINT)) AS BIGINT)
        |    AS s_stat
        |  FROM d a JOIN d b ON a.day < b.day),
        |ties AS (
        |  SELECT CAST(SUM(t*(t-1)) AS BIGINT) AS ux2,
        |    CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tcorr
        |  FROM (SELECT COUNT(*) AS t FROM d GROUP BY rev)),
        |n AS (SELECT COUNT(*) AS n_days FROM d),
        |v AS (
        |  SELECT n_days, s_stat, ux2,
        |    n_days*(n_days-1)*(2*n_days+5) - tcorr AS var18,
        |    n_days*(n_days-1) AS d0x2
        |  FROM s CROSS JOIN ties CROSS JOIN n),
        |z AS (
        |  SELECT n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
        |    CASE WHEN d0x2 > ux2 AND d0x2 > 0 THEN
        |      CAST(floor(CAST(s_stat AS DOUBLE) /
        |        sqrt((CAST(d0x2 AS DOUBLE) / 2.0) *
        |             (CAST(d0x2 - ux2 AS DOUBLE) / 2.0)) * 1e6)
        |        AS BIGINT) / 1e6
        |    END AS tau_b,
        |    CASE WHEN s_stat > 0 THEN
        |        CAST(floor(CAST(s_stat - 1 AS DOUBLE) /
        |          sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6) AS BIGINT) / 1e6
        |      WHEN s_stat < 0 THEN
        |        CAST(floor(CAST(s_stat + 1 AS DOUBLE) /
        |          sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1e6) AS BIGINT) / 1e6
        |      ELSE 0.0 END AS z_stat
        |  FROM v)
        |SELECT n_days, s_stat, var18, tau_b, z_stat,
        |  CASE WHEN z_stat >= 1.96 THEN 'increasing'
        |       WHEN z_stat <= -1.96 THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM z""".stripMargin,
    "q_window_cusum" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS s FROM d),
        |p AS (
        |  SELECT day, rev, n, s,
        |    CAST(SUM(n*rev - s) OVER (ORDER BY day) AS BIGINT) AS p
        |  FROM d CROSS JOIN t),
        |c AS (
        |  SELECT day, rev, n, s,
        |    p - least(CAST(MIN(p) OVER (ORDER BY day) AS BIGINT), 0) AS cus
        |  FROM p)
        |SELECT day, rev AS rev_cents,
        |  CAST(floor(CAST(cus AS DOUBLE) / n / 100.0 * 1e6) AS BIGINT)
        |    / 1e6 AS cusum_dollars,
        |  CAST(CASE WHEN cus > 2*s THEN 1 ELSE 0 END AS INT) AS shift_flag
        |FROM c ORDER BY day""".stripMargin,
    "q_window_ewma" -> ewmaSql,
    // exact-decimal window sums cast to double once, variance in the
    // identical operation order, flag on the ROUNDED z — see
    // anomalyZscore's numeric-discipline scaladoc
    "q_window_anomaly_zscore" ->
      """WITH s AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
        |    CAST(count(*) OVER w7 AS DOUBLE) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(14,2))) OVER w7 AS DOUBLE)
        |      AS s1,
        |    CAST(sum(CAST(value AS DECIMAL(14,2))
        |             * CAST(value AS DECIMAL(14,2))) OVER w7 AS DOUBLE)
        |      AS s2
        |  FROM events
        |  WINDOW w7 AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |v AS (
        |  SELECT *, (n * s2 - s1 * s1) / (n * n) AS variance FROM s),
        |z AS (
        |  SELECT user_id, event_id, ts_ms, value,
        |    CAST(n AS BIGINT) AS n_window,
        |    CASE WHEN variance > 0.000000000001
        |         THEN round((value - s1 / n) / sqrt(variance), 6) END AS z
        |  FROM v)
        |SELECT user_id, event_id, ts_ms, value, n_window, z,
        |  CAST(abs(coalesce(z, 0)) > 2.0 AS INT) AS is_anomaly
        |FROM z ORDER BY user_id, ts_ms, event_id""".stripMargin,
    // window-only attribution replay: next-purchase via the same
    // min-over-following frame, credit in integer millionths. Mirrors
    // attribution (incl. the same-ts conversion coalescing).
    "q_window_attribution" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS conv_ts
        |  FROM events WHERE user_id IS NOT NULL),
        |a AS (
        |  SELECT * FROM t
        |  WHERE event_type <> 'purchase' AND conv_ts IS NOT NULL
        |    AND epoch_us(conv_ts) - epoch_us(ts) <= 604800000000),
        |r AS (
        |  SELECT event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, conv_ts
        |                       ORDER BY ts, event_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY user_id, conv_ts) AS n_t
        |  FROM a)
        |SELECT event_type, COUNT(*) AS n_touches,
        |  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_first,
        |  CAST(SUM(CASE WHEN rk = n_t THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_last,
        |  round(CAST(CAST(SUM(1000000 // n_t) AS BIGINT) AS DOUBLE)
        |    / 1e6, 6) AS linear_credit
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_window_transitions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 600000000
        |         OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |pairs AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id, sid
        |                              ORDER BY ts, event_id) AS to_type
        |  FROM sess),
        |c AS (
        |  SELECT from_type, to_type, COUNT(*) AS n FROM pairs
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, SUM(n) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / n_from, 6) AS p
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, to_type""".stripMargin,
    "q_window_rfm_segments" ->
      """WITH maxd AS (
        |  SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders),
        |per AS (
        |  SELECT o_custkey,
        |    date_diff('day', max(CAST(o_orderdate AS DATE)),
        |              (SELECT max_day FROM maxd)) AS recency,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |scored AS (
        |  SELECT o_custkey,
        |    6 - ntile(5) OVER (ORDER BY recency, o_custkey) AS r,
        |    ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
        |    ntile(5) OVER (ORDER BY monetary, o_custkey) AS m
        |  FROM per)
        |SELECT r, f, m, COUNT(*) AS n_customers
        |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_window_moving_avg" ->
      """WITH b AS (
        |  SELECT date_trunc('day', MIN(ts)) AS d0,
        |         date_trunc('day', MAX(ts)) AS d1 FROM events),
        |u AS (SELECT DISTINCT user_id FROM events),
        |spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM u, b),
        |daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |dense AS (
        |  SELECT s.user_id, epoch_ms(s.day) AS day_ms,
        |    coalesce(d.n, 0) AS n, coalesce(d.sum_value, 0.0) AS sum_value
        |  FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, day_ms, n, sum_value,
        |  round(CAST(SUM(CAST(sum_value AS DECIMAL(14,2))) OVER w AS DOUBLE)
        |        / COUNT(*) OVER w, 6) AS ma7
        |FROM dense
        |WINDOW w AS (PARTITION BY user_id ORDER BY day_ms
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day_ms""".stripMargin,
    "q_window_resample_gapfill" ->
      """WITH b AS (
        |  SELECT date_trunc('day', MIN(ts)) AS d0,
        |         date_trunc('day', MAX(ts)) AS d1 FROM events),
        |u AS (SELECT DISTINCT user_id FROM events),
        |spine AS (
        |  SELECT user_id,
        |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM u, b),
        |daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT s.user_id, epoch_ms(s.day) AS day_ms,
        |  coalesce(d.n, 0) AS n, coalesce(d.sum_value, 0.0) AS sum_value
        |FROM spine s LEFT JOIN daily d USING (user_id, day)
        |ORDER BY user_id, day_ms""".stripMargin,
    "q_window_event_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT u.user_id,
        |  CASE WHEN p.p_ts IS NOT NULL THEN 3
        |       WHEN c.c_ts IS NOT NULL THEN 2
        |       WHEN v.v_ts IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
        |  epoch_ms(v.v_ts) AS v_ms, epoch_ms(c.c_ts) AS c_ms,
        |  epoch_ms(p.p_ts) AS p_ms
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_window_distribution" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_ranking" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
        |  DENSE_RANK() OVER w AS drk, NTILE(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_analytic" ->
      """SELECT event_id, user_id, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  FIRST_VALUE(value) OVER w AS first_value,
        |  LAST_VALUE(value) OVER w AS last_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "q_window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  datediff('day', DATE '1995-01-01', o_orderdate) AS day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY datediff('day', DATE '1995-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_30d_spend
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_window_running_sum" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_orderkey""".stripMargin)
}
