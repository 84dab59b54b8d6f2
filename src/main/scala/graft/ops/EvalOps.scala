package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation statistics a training/eval pipeline runs AFTER the
  * corpus work: pairwise-preference ratings, sampled-success pass@k,
  * paired-classifier comparison, multiple-testing control, and
  * monotone calibration. All are fully DuckDB-oracled: bounded domains
  * (suppliers, score bins, a 31-token vocabulary, k ∈ {1,3,5}) keep
  * every iterative/quadratic piece corpus-independent, and the corpus
  * enters only through hash aggregations. House numeric rules apply:
  * exact int64/decimal moments, one micro-floored double division per
  * readout column, min/max (order-independent) over doubles preferred
  * to sums where possible.
  */
object EvalOps extends graft.QueryModule {

  private def micro(c: Column): Column = floor(c * 1e6).cast("long") / 1e6

  /** q_ml_bradley_terry — Bradley–Terry preference ratings via the MM
    * algorithm (Hunter, Annals of Statistics 2004, eq. 1.4): pairwise
    * duels are derived from the data (two suppliers sharing an order
    * compete on exact-cents line revenue; ties are dropped), collapsed
    * once into the per-pair win matrix, and 8 fixed MM rounds iterate
    * p_i ← W_i / Σ_j n_ij/(p_i+p_j). Ratings are scale-free, so
    * normalization happens ONCE at readout (divide by the mean) — no
    * per-round scalar frame. Scale: the duel self-join is per-order
    * (≤ C(7,2) pairs each), the win matrix is bounded by the supplier
    * domain squared (observed pairs only), and every MM round joins
    * that matrix to the ≤|supplier| rating frame (broadcast) — round
    * count is constant, each round localCheckpointed to cut lineage
    * (the kcore discipline). The corpus is scanned exactly once. */
  def bradleyTerry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val per = graft.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey",
        expr("cast(cast(l_extendedprice as decimal(14,2))*100 as bigint)")
          .as("cents"))
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(sum($"cents").as("tot"))
    val duels = per.as("a").join(per.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") < col("b.l_suppkey") &&
          col("a.tot") =!= col("b.tot"))
      .select(col("a.l_suppkey").as("si"), col("b.l_suppkey").as("sj"),
        when(col("a.tot") > col("b.tot"), 1L).otherwise(0L).as("wi"),
        when(col("b.tot") > col("a.tot"), 1L).otherwise(0L).as("wj"))
    // win matrix over observed supplier pairs — bounded by the supplier
    // domain squared; reused every MM round, so pin it once
    val pairs = duels.groupBy($"si", $"sj")
      .agg(sum($"wi").as("wij"), sum($"wj").as("wji"),
        count(lit(1)).as("nij"))
      .localCheckpoint()
    val edges = pairs.select($"si".as("s"), $"sj".as("o"), $"nij".as("n"))
      .unionAll(pairs.select($"sj".as("s"), $"si".as("o"), $"nij".as("n")))
    val wins = pairs.select($"si".as("s"), $"wij".as("w"), $"nij".as("n"))
      .unionAll(pairs.select($"sj".as("s"), $"wji".as("w"), $"nij".as("n")))
      .groupBy($"s").agg(sum($"w").as("w"), sum($"n").as("nc"))
      .localCheckpoint()
    // 8 MM rounds; a supplier that never wins fixes at p=0 (the MLE
    // boundary), and p_i+p_j>0 holds for every observed pair because
    // tie-dropped duels always produce a winner on one side
    var p = wins.select($"s", lit(1.0).as("p")).localCheckpoint()
    for (_ <- 1 to 8) {
      val denom = edges
        .join(broadcast(p.select($"s", $"p".as("ps"))), Seq("s"))
        .join(broadcast(p.select($"s".as("o"), $"p".as("po"))), Seq("o"))
        .groupBy($"s").agg(sum($"n" / ($"ps" + $"po")).as("den"))
      p = wins.join(denom, Seq("s"))
        .select($"s", ($"w".cast("double") / $"den").as("p"))
        .localCheckpoint()
    }
    val norm = p.agg(avg($"p").as("pbar")) // 1-row scalar frame
    wins.join(p, Seq("s")).crossJoin(broadcast(norm))
      .select($"s".as("suppkey"), $"w".as("wins"),
        $"nc".as("n_comparisons"), micro($"p" / $"pbar").as("rating"))
      .orderBy($"suppkey")
  }

  private def btOracle: String = {
    val iters = (1 to 8).map { i =>
      s"""d$i AS MATERIALIZED (SELECT e.s AS s, SUM(e.n / (pa.p + pb.p)) AS den
         |  FROM edges e JOIN r${i - 1} pa ON e.s = pa.s
         |  JOIN r${i - 1} pb ON e.o = pb.s GROUP BY e.s),
         |r$i AS MATERIALIZED (SELECT w.s AS s, w.w / d.den AS p
         |  FROM wins w JOIN d$i d ON w.s = d.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH per AS (
       |  SELECT l_orderkey AS ok, l_suppkey AS s,
       |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))*100 AS BIGINT))
       |      AS tot
       |  FROM lineitem GROUP BY 1, 2),
       |duels AS (
       |  SELECT a.s AS si, b.s AS sj,
       |    CASE WHEN a.tot > b.tot THEN 1 ELSE 0 END AS wi,
       |    CASE WHEN b.tot > a.tot THEN 1 ELSE 0 END AS wj
       |  FROM per a JOIN per b
       |    ON a.ok = b.ok AND a.s < b.s AND a.tot <> b.tot),
       |pairs AS MATERIALIZED (
       |  SELECT si, sj, CAST(SUM(wi) AS BIGINT) AS wij,
       |    CAST(SUM(wj) AS BIGINT) AS wji, CAST(COUNT(*) AS BIGINT) AS nij
       |  FROM duels GROUP BY 1, 2),
       |edges AS MATERIALIZED (
       |  SELECT si AS s, sj AS o, nij AS n FROM pairs
       |  UNION ALL SELECT sj, si, nij FROM pairs),
       |wins AS MATERIALIZED (
       |  SELECT s, CAST(SUM(w) AS BIGINT) AS w, CAST(SUM(n) AS BIGINT) AS nc
       |  FROM (SELECT si AS s, wij AS w, nij AS n FROM pairs
       |        UNION ALL SELECT sj, wji, nij FROM pairs)
       |  GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT s, CAST(1.0 AS DOUBLE) AS p FROM wins),
       |$iters
       |SELECT wins.s AS suppkey, wins.w AS wins, wins.nc AS n_comparisons,
       |  CAST(floor(r8.p / (SELECT AVG(p) FROM r8) * 1e6) AS BIGINT) / 1e6
       |    AS rating
       |FROM wins JOIN r8 ON wins.s = r8.s ORDER BY suppkey""".stripMargin
  }

  /** q_ml_pass_at_k — the unbiased pass@k estimator (Chen et al. 2021,
    * "Evaluating LLMs Trained on Code", eq. 1): per problem with n
    * samples and c successes, pass@k = 1 − C(n−c,k)/C(n,k), averaged
    * over problems with n ≥ k. Problems = customers, samples = their
    * orders, success = order reached final status 'F'. The binomial
    * ratio is the exact integer falling-factorial quotient
    * Π_{j<k}(n−c−j) / Π_{j<k}(n−j), unrolled per k ∈ {1,3,5} (n ≤ 25,
    * so products fit int64 with room); a zero factor zeroes the
    * numerator exactly — no lgamma, no float cancellation. One
    * aggregation to the customer domain, then a 3-row broadcast k-dim
    * theta join (bounded by construction). */
  def passAtK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val per = graft.Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("c"))
    val ks = Seq(1, 3, 5).toDF("k")
    val u = $"n" - $"c"
    val numer = when($"k" === 1, greatest(u, lit(0L)))
      .when($"k" === 3, greatest(u * (u - 1L) * (u - 2L), lit(0L)))
      .otherwise(greatest(
        u * (u - 1L) * (u - 2L) * (u - 3L) * (u - 4L), lit(0L)))
    val denom = when($"k" === 1, $"n")
      .when($"k" === 3, $"n" * ($"n" - 1L) * ($"n" - 2L))
      .otherwise($"n" * ($"n" - 1L) * ($"n" - 2L) * ($"n" - 3L) *
        ($"n" - 4L))
    per.join(broadcast(ks), $"n" >= $"k")
      .select($"k",
        (lit(1.0) - numer.cast("double") / denom.cast("double")).as("pass"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n_problems"), micro(avg($"pass")).as("pass_at_k"))
      .orderBy($"k")
  }

  /** q_ml_mcnemar — McNemar's paired test comparing two deterministic
    * classifiers on the same rows (the right test when two models are
    * evaluated on one eval set — only the DISAGREEMENT cells carry
    * information): rule A calls an order final when its total exceeds
    * 150k, rule B when its priority is urgent/high; truth is status
    * 'F'. b = A-only-correct, c = B-only-correct; the continuity-
    * corrected statistic (|b−c|−1)²/(b+c) is χ²₁ under H₀ (Edwards
    * 1948), NULL-guarded when b+c = 0. Exact integer cells from one
    * corpus aggregation; two micro-floored divisions at readout. */
  def mcnemar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val truth = $"o_orderstatus" === "F"
    val predA = $"o_totalprice" > 150000.0
    val predB = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    val okA = predA === truth
    val okB = predB === truth
    graft.Tables.orders(spark, sfDir)
      .agg(count(lit(1)).as("n_obs"),
        sum(when(okA, 1L).otherwise(0L)).as("na"),
        sum(when(okB, 1L).otherwise(0L)).as("nb"),
        sum(when(okA && !okB, 1L).otherwise(0L)).as("only_a"),
        sum(when(!okA && okB, 1L).otherwise(0L)).as("only_b"))
      .select($"n_obs", $"only_a", $"only_b",
        micro($"na".cast("double") / $"n_obs").as("acc_a"),
        micro($"nb".cast("double") / $"n_obs").as("acc_b"),
        when($"only_a" + $"only_b" > 0L, micro(
          (greatest(abs($"only_a" - $"only_b") - 1L, lit(0L)) *
            greatest(abs($"only_a" - $"only_b") - 1L, lit(0L)))
            .cast("double") / ($"only_a" + $"only_b").cast("double")))
          .as("chi2"))
  }

  /** q_ml_fdr_bh — Benjamini–Hochberg step-up FDR control (JRSS-B
    * 1995) over a real hypothesis family: each of the corpus's
    * vocabulary tokens is tested against the uniform-share null
    * (count_t vs N/m) with a one-proportion z statistic, and the
    * conservative sub-Gaussian tail bound p = exp(−z²/2) ≥ P(|Z|≥z)/2
    * (valid, monotone in |z| — the PROCEDURE is the operator under
    * test; fixtures: 1 rejection at sf0.01, 18 at sf0.1, so the
    * step-up boundary is exercised non-vacuously at both scales).
    * p is micro-floored ONCE and that p6 drives ranking, the BH
    * comparison, and the readout — cross-engine exp() last-ulp skew
    * cannot reorder the family. The family is the bounded vocabulary
    * (m = 31 here): the rank window and step-up max run on m rows,
    * never the corpus. */
  def fdrBh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = graft.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .filter(length($"token") > 0)
      .groupBy($"token").agg(count(lit(1)).as("n"))
    val g = c.agg(sum($"n").as("tn"), count(lit(1)).as("m")) // 1 row
    val z = ($"n" - $"tn".cast("double") / $"m") /
      sqrt($"tn".cast("double") / $"m" * (lit(1.0) - lit(1.0) / $"m"))
    val scored = c.crossJoin(broadcast(g))
      .select($"token", $"n", $"m", micro(z).as("z6"),
        micro(exp(-z * z / 2)).as("p6"))
    val rank = row_number().over(Window.orderBy($"p6", $"token"))
      .cast("long")
    val ranked = scored.withColumn("rank", rank)
      .withColumn("bh_thresh", micro(lit(0.05) * $"rank" / $"m"))
    val stepUp = max(when($"p6" <= $"bh_thresh", $"rank"))
      .over(Window.partitionBy())
    ranked
      .select($"token", $"n", $"z6", $"p6", $"rank", $"bh_thresh",
        ($"rank" <= coalesce(stepUp, lit(0))).as("rejected"))
      .orderBy($"token")
  }

  /** q_ml_isotonic_calibration — isotonic (PAV) calibration of a
    * score→label curve without the sequential pool-adjacent-violators
    * scan: over the bounded score-bin domain the fit has the
    * declarative minimax form iso(i) = max_{j≤i} min_{k≥i} mean(j..k)
    * (Barlow et al. 1972, §1.2) — exact integer prefix sums give every
    * interval mean in one bounded self-join, the inner min is a
    * reverse-cumulative window min per j, the outer max a per-i
    * aggregate. min/max over doubles are order-independent, so the
    * fit is bit-deterministic; the corpus appears in ONE hash
    * aggregation to ≤100 price bins. */
  def isotonicCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bins = graft.Tables.orders(spark, sfDir)
      .select(least(floor($"o_totalprice" / 6000.0), lit(99.0))
        .cast("long").as("bin"),
        when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"))
      .groupBy($"bin").agg(count(lit(1)).as("nb"), sum($"y").as("sb"))
    val w = Window.orderBy($"bin") // ≤100-row domain frame
    val pref = bins.select($"bin", $"nb", $"sb",
      sum($"nb").over(w).as("cn"), sum($"sb").over(w).as("cs"))
    // interval means A(j,k) for j ≤ k over the bin domain
    val a = pref.as("j").join(pref.as("k"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("jb"), col("k.bin").as("kb"),
        ((col("k.cs") - (col("j.cs") - col("j.sb"))).cast("double") /
          (col("k.cn") - (col("j.cn") - col("j.nb"))).cast("double"))
          .as("m"))
    // M(j,i) = min_{k≥i} A(j,k): reverse-cumulative min within j
    val wj = Window.partitionBy($"jb").orderBy($"kb".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inner = a.withColumn("rmin", min($"m").over(wj))
    // iso(i) = max_{j≤i} M(j,i)
    val iso = inner.filter($"jb" <= $"kb")
      .groupBy($"kb".as("bin")).agg(max($"rmin").as("iso_raw"))
    bins.join(iso, Seq("bin"))
      .select($"bin", $"nb".as("n"),
        micro($"sb".cast("double") / $"nb".cast("double")).as("rate"),
        micro($"iso_raw").as("iso_rate"))
      .orderBy($"bin")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_bradley_terry" -> (bradleyTerry _),
    "q_ml_pass_at_k" -> (passAtK _),
    "q_ml_mcnemar" -> (mcnemar _),
    "q_ml_fdr_bh" -> (fdrBh _),
    "q_ml_isotonic_calibration" -> (isotonicCalibration _))

  def oracle: Map[String, String] = Map(
    "q_ml_bradley_terry" -> btOracle,
    "q_ml_pass_at_k" ->
      """WITH per AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |ks AS (SELECT unnest([1, 3, 5]) AS k),
        |px AS (
        |  SELECT k,
        |    1.0 - CAST(CASE k
        |      WHEN 1 THEN greatest(n - c, 0)
        |      WHEN 3 THEN greatest((n-c)*(n-c-1)*(n-c-2), 0)
        |      ELSE greatest((n-c)*(n-c-1)*(n-c-2)*(n-c-3)*(n-c-4), 0)
        |      END AS DOUBLE) /
        |    CAST(CASE k
        |      WHEN 1 THEN n
        |      WHEN 3 THEN n*(n-1)*(n-2)
        |      ELSE n*(n-1)*(n-2)*(n-3)*(n-4) END AS DOUBLE) AS pass
        |  FROM per JOIN ks ON n >= k)
        |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_problems,
        |  CAST(floor(AVG(pass) * 1e6) AS BIGINT) / 1e6 AS pass_at_k
        |FROM px GROUP BY k ORDER BY k""".stripMargin,
    "q_ml_mcnemar" ->
      """WITH cells AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(CASE WHEN oka THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN okb THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN oka AND NOT okb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS only_a,
        |    CAST(SUM(CASE WHEN NOT oka AND okb THEN 1 ELSE 0 END)
        |      AS BIGINT) AS only_b
        |  FROM (SELECT
        |      (o_totalprice > 150000.0) = (o_orderstatus = 'F') AS oka,
        |      (o_orderpriority IN ('1-URGENT', '2-HIGH')) =
        |        (o_orderstatus = 'F') AS okb
        |    FROM orders))
        |SELECT n_obs, only_a, only_b,
        |  CAST(floor(CAST(na AS DOUBLE) / n_obs * 1e6) AS BIGINT) / 1e6
        |    AS acc_a,
        |  CAST(floor(CAST(nb AS DOUBLE) / n_obs * 1e6) AS BIGINT) / 1e6
        |    AS acc_b,
        |  CASE WHEN only_a + only_b > 0 THEN
        |    CAST(floor(CAST(greatest(abs(only_a - only_b) - 1, 0) *
        |        greatest(abs(only_a - only_b) - 1, 0) AS DOUBLE) /
        |      CAST(only_a + only_b AS DOUBLE) * 1e6) AS BIGINT) / 1e6
        |  END AS chi2
        |FROM cells""".stripMargin,
    "q_ml_fdr_bh" ->
      """WITH c AS (
        |  SELECT tk AS token, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tk
        |        FROM documents)
        |  WHERE length(tk) > 0 GROUP BY 1),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |             CAST(COUNT(*) AS BIGINT) AS m FROM c),
        |scored AS (
        |  SELECT token, n, m,
        |    CAST(floor(((n - CAST(tn AS DOUBLE) / m) /
        |      sqrt(CAST(tn AS DOUBLE) / m * (1.0 - 1.0 / m))) * 1e6)
        |      AS BIGINT) / 1e6 AS z6,
        |    CAST(floor(exp(-((n - CAST(tn AS DOUBLE) / m) /
        |        sqrt(CAST(tn AS DOUBLE) / m * (1.0 - 1.0 / m))) *
        |      ((n - CAST(tn AS DOUBLE) / m) /
        |        sqrt(CAST(tn AS DOUBLE) / m * (1.0 - 1.0 / m))) / 2) * 1e6)
        |      AS BIGINT) / 1e6 AS p6
        |  FROM c, g),
        |ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p6, token) AS BIGINT)
        |      AS rank,
        |    CAST(floor(0.05 * ROW_NUMBER() OVER (ORDER BY p6, token) / m
        |      * 1e6) AS BIGINT) / 1e6 AS bh_thresh
        |  FROM scored)
        |SELECT token, n, z6, p6, rank, bh_thresh,
        |  rank <= COALESCE(
        |    MAX(CASE WHEN p6 <= bh_thresh THEN rank END) OVER (), 0)
        |    AS rejected
        |FROM ranked ORDER BY token""".stripMargin,
    "q_ml_isotonic_calibration" ->
      """WITH bins AS (
        |  SELECT CAST(least(floor(o_totalprice / 6000.0), 99.0) AS BIGINT)
        |      AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS sb
        |  FROM orders GROUP BY 1),
        |pref AS (
        |  SELECT bin, nb, sb,
        |    CAST(SUM(nb) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(SUM(sb) OVER (ORDER BY bin) AS BIGINT) AS cs
        |  FROM bins),
        |a AS (
        |  SELECT j.bin AS jb, k.bin AS kb,
        |    CAST(k.cs - (j.cs - j.sb) AS DOUBLE) /
        |    CAST(k.cn - (j.cn - j.nb) AS DOUBLE) AS m
        |  FROM pref j JOIN pref k ON j.bin <= k.bin),
        |inner_min AS (
        |  SELECT jb, kb,
        |    MIN(m) OVER (PARTITION BY jb ORDER BY kb DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmin
        |  FROM a),
        |iso AS (
        |  SELECT kb AS bin, MAX(rmin) AS iso_raw
        |  FROM inner_min WHERE jb <= kb GROUP BY kb)
        |SELECT bins.bin AS bin, nb AS n,
        |  CAST(floor(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) * 1e6)
        |    AS BIGINT) / 1e6 AS rate,
        |  CAST(floor(iso_raw * 1e6) AS BIGINT) / 1e6 AS iso_rate
        |FROM bins JOIN iso ON bins.bin = iso.bin ORDER BY bin""".stripMargin)
}
