package graft.ops

import graft.SparkTestBase

/** Degenerate-input drills for the round-14 operators (the advisory
  * class that bit ateStrata/hillTail/mapMrr in round 13): every
  * fixture here is a REAL degenerate corpus — one-day series,
  * single-class labels, one-group populations, constant samples —
  * and the assertion is the DEFINED readout (NULL columns or zero
  * rows), never an Infinity, NaN, or cast error. Each guard is
  * mirrored as a CASE/WHERE in the DuckDB twin, so the engines stay
  * hash-identical on these shapes too. */
class Wave14DegenSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.expr

  /** orders fixture: every order on ONE day, same segment-less shape */
  private lazy val oneDayDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg1").toString
    Seq(
      (1L, 10L, "F", 100.0, "1995-01-01 00:00:00", "1-URGENT"),
      (2L, 11L, "F", 100.0, "1995-01-01 00:00:00", "1-URGENT"),
      (3L, 12L, "F", 100.0, "1995-01-01 00:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "ts", "o_orderpriority")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("pettitt: a one-day series has no pairs -> zero rows, no NULL row") {
    assert(WindowOps.pettitt(spark, oneDayDir).collect().isEmpty)
  }

  test("kruskal_dow: one day -> NULL H (0/0 correction), engine == twin") {
    val row = WindowOps.kruskalDow(spark, oneDayDir).collect().head
    assert(row.getLong(0) === 1L)
    assert(row.isNullAt(2) && row.isNullAt(3))
  }

  test("friedman: a single system makes W's denominator 0 -> NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg2").toString
    Seq((1L, 10L, 100.0, "1995-01-05 00:00:00"),
      (2L, 11L, 200.0, "1995-02-05 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "ts")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "BUILDING"), (11L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val row = EvalOps.friedmanTest(spark, dir).collect().head
    assert(row.getLong(1) === 1L) // k_systems = 1
    assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
  }

  test("youden/gains: a single-class corpus has no ROC -> zero rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg3").toString
    Seq((1L, "O", 100.0), (2L, "O", 5000.0), (3L, "O", 90000.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    assert(EvalOps.youdenJ(spark, dir).collect().isEmpty)
    assert(EvalOps.gainsTable(spark, dir).collect().isEmpty)
  }

  test("tost/hedges: constant samples zero the SE/pooled SD -> NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg4").toString
    Seq((1L, "src0", 100L, "x"), (2L, "src0", 100L, "x"),
      (3L, "src1", 100L, "y"), (4L, "src1", 100L, "y"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val t = QualityOps.tostEquivalence(spark, dir).collect().head
    assert(t.getDouble(2) === 0.0) // mean_diff still defined
    assert(t.isNullAt(3) && t.isNullAt(4) && t.isNullAt(5) && t.isNullAt(6))
    val h = QualityOps.hedgesG(spark, dir).collect().head
    assert(h.isNullAt(3) && h.isNullAt(4) && h.isNullAt(5))
  }

  test("anova/levene: one group (k=1) leaves no between-group df -> NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg5").toString
    Seq((1L, "src0", 100L, "a b"), (2L, "src0", 200L, "c d"),
      (3L, "src0", 300L, "e f"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val a = QualityOps.anovaOneway(spark, dir).collect().head
    assert(a.getLong(1) === 1L && a.isNullAt(2) && a.isNullAt(3))
    val l = QualityOps.leveneBf(spark, dir).collect().head
    assert(l.getLong(1) === 1L && l.isNullAt(2))
  }

  test("stl_strength: a constant series -> NULL strengths, no 0/0") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg7").toString
    val rows = (1 to 20).map(d =>
      (d.toLong, f"1995-01-$d%02d 00:00:00", 100.0))
    rows.toDF("o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", expr("cast(ts as timestamp)")).drop("ts")
      .write.parquet(s"$dir/orders.parquet")
    val row = WindowOps.stlStrength(spark, dir).collect().head
    assert(row.getLong(0) === 14L) // 20 days minus the 2x3 edge
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("krippendorff/weighted_kappa: unanimous labels -> NULL agreement") {
    // every doc short + few tokens + few distinct => all three
    // annotators emit class 0 everywhere: D_e = 0, sum_we = 0
    val dir = java.nio.file.Files.createTempDirectory("graft-dg8").toString
    Seq((1L, "src0", 100L, "a b c"), (2L, "src0", 110L, "d e f"),
      (3L, "src1", 120L, "g h i"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val k = QualityOps.krippendorffAlpha(spark, dir).collect().head
    assert(k.getLong(0) === 3L && k.isNullAt(4)) // alpha NULL
    assert(k.getDouble(2) === 0.0) // D_o is defined: zero disagreement
    val w = QualityOps.weightedKappa(spark, dir).collect().head
    assert(w.getLong(1) === 0L && w.isNullAt(2))
  }

  test("cliff_delta: a missing side has no cross pairs -> NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg9").toString
    Seq((1L, "src0", 100L, "a"), (2L, "src0", 200L, "b"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val row = QualityOps.cliffDelta(spark, dir).collect().head
    assert(row.getLong(1) === 0L) // n1 = 0
    assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4) &&
      row.isNullAt(5))
  }

  test("anova: perfect separation (SSW = 0) -> NULL F, not Infinity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dg6").toString
    Seq((1L, "src0", 100L, "a"), (2L, "src0", 100L, "b"),
      (3L, "src1", 200L, "c"), (4L, "src1", 200L, "d"))
      .toDF("doc_id", "source", "n_chars", "text")
      .write.parquet(s"$dir/documents.parquet")
    val a = QualityOps.anovaOneway(spark, dir).collect().head
    assert(a.getLong(1) === 2L && a.isNullAt(2) && a.isNullAt(3))
  }
}
