package graft.ops

import graft.SparkTestBase

/** Round-15 degenerate-input drills closing the gap ADVICE r14 found:
  * Wave14DegenSpec covered stl_strength's constant series but not the
  * other constant-series readouts in the same file. Every fixture here
  * is a REAL degenerate corpus (constant series, one-block-size
  * calendar, two-system Friedman, three-weekday calendar) and every
  * assertion is the DEFINED readout — NULL columns or zero rows, never
  * a NaN, Infinity, or cast error. Each guard is mirrored as a CASE in
  * the DuckDB twin, so the engines stay hash-identical on these shapes
  * too. */
class Wave15DegenSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.expr

  /** ten-day CONSTANT daily-revenue series: every u_t = n·x − Σx = 0,
    * so γ₀ = 0 and Σu² = 0 — the exact shape that zeroed the HAC /
    * portmanteau / variance-ratio denominators */
  private lazy val constTenDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15a").toString
    (1 to 10).map(d => (d.toLong, f"1995-01-$d%02d 00:00:00", 100.0))
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("newey_west: constant series -> g0=0 -> NULL hac_ratio, 0 SEs") {
    val row = WindowOps.neweyWest(spark, constTenDir).collect().head
    assert(row.getLong(0) === 10L)
    assert(row.getDouble(2) === 0.0) // se_naive defined: sqrt(0)
    assert(row.getDouble(3) === 0.0) // se_hac defined: lrv = 0
    assert(row.isNullAt(4)) // hac_ratio is 0/0 -> gated NULL
  }

  test("ljung_box: constant series -> g0=0 -> NULL Q, no 0/0") {
    val row = WindowOps.ljungBox(spark, constTenDir).collect().head
    assert(row.getLong(0) === 10L)
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("ljung_box: a short (nd<=7) series -> NULL Q, no (n-k)=0 division") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15b").toString
    (1 to 5).map(d => (d.toLong, f"1995-01-$d%02d 00:00:00", d * 100.0))
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    val row = WindowOps.ljungBox(spark, dir).collect().head
    assert(row.getLong(0) === 5L)
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("variance_ratio: constant series -> uu1=0 -> NULL VR at every q") {
    val rows = WindowOps.varianceRatio(spark, constTenDir).collect()
    assert(rows.length === 3) // q = 2, 5, 10 all have full windows
    assert(rows.forall(_.isNullAt(2)))
  }

  test("hurst: 16-31 days -> one block size -> zero OLS denom -> NULL H") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15c").toString
    (1 to 20).map(d => (d.toLong, f"1995-01-$d%02d 00:00:00", d * 7.0))
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    val rows = WindowOps.hurst(spark, dir).collect()
    assert(rows.length === 1) // only bs=16 fills a block
    assert(rows.head.getLong(0) === 16L)
    assert(!rows.head.isNullAt(2)) // mean_rs defined
    assert(rows.head.isNullAt(3)) // a 1-point slope is undefined
  }

  test("hurst: constant series -> all blocks zero-variance -> zero rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15d").toString
    (1 to 20).map(d => (d.toLong, f"1995-01-$d%02d 00:00:00", 100.0))
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    assert(WindowOps.hurst(spark, dir).collect().isEmpty)
  }

  test("friedman: k=2 is a VALID test (crit 3.841), significant non-NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15e").toString
    Seq((1L, 10L, 100.0, "1995-01-05 00:00:00"),
      (2L, 11L, 200.0, "1995-01-20 00:00:00"),
      (3L, 10L, 300.0, "1995-02-05 00:00:00"),
      (4L, 11L, 150.0, "1995-02-20 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "ts")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "BUILDING"), (11L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val row = EvalOps.friedmanTest(spark, dir).collect().head
    assert(row.getLong(0) === 2L && row.getLong(1) === 2L)
    assert(!row.isNullAt(2) && !row.isNullAt(3))
    assert(!row.isNullAt(4)) // the r14 gap: k=2 used to NULL out here
    // n=2 blocks of opposite order: chi2 = 0 exactly, not significant
    assert(row.getBoolean(4) === false)
  }

  test("acf: constant series -> every r_k is 0/0 -> all NULL") {
    val row = WindowOps.acf(spark, constTenDir).collect().head
    assert(row.getLong(0) === 10L)
    assert((1 to 7).forall(row.isNullAt))
  }

  test("ccf: constant series zeroes both variance factors -> NULL ccf") {
    val rows = WindowOps.ccf(spark, constTenDir).collect()
    assert(rows.length === 8) // lags 0..7
    assert(rows.forall(_.isNullAt(2)))
  }

  test("spearman: constant series -> undefined correlations -> NULLs") {
    val row = WindowOps.spearman(spark, constTenDir).collect().head
    assert(row.getLong(0) === 10L)
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("mann_kendall: all-tied series -> NULL tau_b, z=0, trend none") {
    val row = WindowOps.mannKendall(spark, constTenDir).collect().head
    assert(row.getLong(1) === 0L) // S = 0
    assert(row.isNullAt(3)) // tau_b is 0/0 -> gated NULL
    assert(row.getDouble(4) === 0.0)
    assert(row.getString(5) === "none")
  }

  test("runs_test: one-sided and 1-vs-1 sign sequences -> NULL z") {
    // 2 days: the median day drops, one sign remains (n2 = 0)
    val dir1 = java.nio.file.Files.createTempDirectory("graft-dg15g").toString
    Seq((1L, "1995-01-01 00:00:00", 100.0), (2L, "1995-01-02 00:00:00", 200.0))
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir1/orders.parquet")
    val r1 = WindowOps.runsTest(spark, dir1).collect().head
    assert(r1.getLong(0) + r1.getLong(1) === 1L)
    assert(r1.isNullAt(4) && r1.isNullAt(5))
    // 3 days: n1 = n2 = 1 zeroes sigma^2 itself
    val dir2 = java.nio.file.Files.createTempDirectory("graft-dg15h").toString
    Seq((1L, "1995-01-01 00:00:00", 100.0), (2L, "1995-01-02 00:00:00", 200.0),
      (3L, "1995-01-03 00:00:00", 300.0))
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir2/orders.parquet")
    val r2 = WindowOps.runsTest(spark, dir2).collect().head
    assert(r2.getLong(0) === 1L && r2.getLong(1) === 1L)
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("zipf/heaps: one-type vocabulary / single source -> NULL fits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15i").toString
    Seq((1L, "src0", 5L, "a a a"), (2L, "src0", 5L, "a a"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val z = graft.text.TextOps.zipfFit(spark, dir).collect().head
    assert(z.getLong(0) === 1L) // one type -> one rank point
    assert(z.isNullAt(1) && z.isNullAt(2) && z.isNullAt(3))
    val h = graft.text.TextOps.heapsFit(spark, dir).collect().head
    assert(h.getLong(0) === 1L) // one source -> one growth point
    assert(h.isNullAt(1) && h.isNullAt(2) && h.isNullAt(3))
  }

  test("ols/ratio_ci: constant-x and 1-row groups -> NULL fit columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15j").toString
    // group A: two lines, SAME quantity (vxx = 0); group N: one line
    Seq((1L, 1, "A", 5.0, 100.0), (2L, 1, "A", 5.0, 200.0),
      (3L, 1, "N", 7.0, 300.0))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val ols = AggOps.olsFit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ols("A").isNullAt(2) && ols("A").isNullAt(3) && ols("A").isNullAt(4))
    assert(ols("N").isNullAt(2)) // 1 row: vxx = 0 too
    val rci = AggOps.ratioDeltaCi(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(!rci("N").isNullAt(2)) // the ratio itself stays defined
    assert(rci("N").isNullAt(3) && rci("N").isNullAt(4) && rci("N").isNullAt(5))
  }

  test("kruskal_dow: a 3-weekday calendar tests at df=2 (crit 5.991)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg15f").toString
    // Mon/Tue/Wed twice each: k_groups = 3, all revenues distinct
    val days = Seq("1995-01-02", "1995-01-03", "1995-01-04",
      "1995-01-09", "1995-01-10", "1995-01-11")
    days.zipWithIndex.map { case (d, i) =>
      ((i + 1).toLong, s"$d 00:00:00", (i + 1) * 110.0) }
      .toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    val row = WindowOps.kruskalDow(spark, dir).collect().head
    assert(row.getLong(0) === 6L && row.getLong(1) === 3L)
    assert(!row.isNullAt(2)) // H defined (no ties, corr = 1)
    // the r14 gap: significance was hardwired to the df=6 threshold;
    // 6 monotone days give H = 5 (well under 5.991) -> not significant
    assert(!row.isNullAt(3) && row.getBoolean(3) === false)
  }
}
