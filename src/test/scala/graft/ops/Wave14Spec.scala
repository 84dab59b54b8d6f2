package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-14 first wave: the three r13 advisory degenerate-input guards
  * (ADVICE.md), each driven through a REAL degenerate fixture — not
  * just asserted on the happy path. The production sf tables never hit
  * these branches (all 5 strata two-armed, 101+ distinct prices, 270
  * fully-relevant docs), so each pin synthesizes the degenerate shape
  * and proves the guarded readout is NULL/absent instead of the old
  * engine-divergent NaN/Infinity-vs-cast-error behavior. */
class Wave14Spec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-wave14-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("ateStrata guard: one-armed stratum leaves numerator AND " +
      "denominator; dropped count surfaces") {
    // stratum 'a': both arms; stratum 'b': both arms; stratum 'c':
    // TREATED ONLY (the advisory's silent-bias shape). Pre-guard, c's
    // ns=2 stayed in nn while its term vanished — biasing ate toward 0
    // by 2/8 of its weight. Post-guard: c drops from both.
    val flagged = Seq(
      ("a", 1L, 100L), ("a", 1L, 200L), ("a", 0L, 50L), ("a", 0L, 150L),
      ("b", 1L, 400L), ("b", 0L, 100L),
      ("c", 1L, 900L), ("c", 1L, 700L)
    ).toDF("lang", "treat", "n_chars")
    val row = MlOps.ateStrataFrom(flagged).collect().head
    assert(row.getLong(0) == 8L)               // n_docs counts ALL rows
    assert(row.getLong(1) == 2L)               // strata used: a, b
    assert(row.getLong(2) == 1L)               // stratum c dropped
    // ate over kept strata only: a: 4*(150-100)=200; b: 2*(400-100)=600
    // → (200+600)/(4+2)
    assert(row.getDouble(4) == micro((4.0 * 50.0 + 2.0 * 300.0) / 6.0))
    // and the naive diff still reads over all rows incl. stratum c
    val m1 = (100.0 + 200.0 + 400.0 + 900.0 + 700.0) / 5.0
    val m0 = (50.0 + 150.0 + 100.0) / 3.0
    assert(row.getDouble(3) == micro(m1 - m0))
  }

  test("hillTail guard: all-equal top prices -> NULL alpha, zero " +
      "gamma; <101 orders -> all-NULL readout (no Infinity)") {
    val orders = graft.Tables.orders(spark, sf0001)
    val priceT = orders.schema("o_totalprice").dataType
    val flat = tmpDir("flat")
    orders.limit(150)
      .withColumn("o_totalprice", lit(77.00).cast(priceT))
      .write.mode("overwrite").parquet(s"$flat/orders.parquet")
    val r1 = AggOps.hillTail(spark, flat).collect().head
    assert(r1.getLong(0) == 100L)
    assert(!r1.isNullAt(1))                     // pivot exists
    assert(r1.getDouble(2) == 0.0)              // gamma: sum(ln(1))=0
    assert(r1.isNullAt(3))                      // alpha guarded to NULL
    val tiny = tmpDir("tiny")
    orders.limit(50)
      .write.mode("overwrite").parquet(s"$tiny/orders.parquet")
    val r2 = AggOps.hillTail(spark, tiny).collect().head
    assert(r2.getLong(0) == 100L)
    assert(r2.isNullAt(1) && r2.isNullAt(2) && r2.isNullAt(3))
  }

  test("mapMrr guard: no fully-relevant doc -> NULL ap_at_k, 0.0 mrr " +
      "(no NaN)") {
    // every doc contains 2 of the 3 query terms: BM25 still ranks 20
    // docs (the readout is live) but rel = {} so n_rel = 0 — exactly
    // the least(0, k) division the advisory flagged.
    val noRel = tmpDir("norel")
    graft.Tables.documents(spark, sf0001)
      .withColumn("text", concat(lit("vector stream filler"),
        lit(" pad"), $"doc_id".cast("string")))
      .write.mode("overwrite").parquet(s"$noRel/documents.parquet")
    val rows = graft.text.SearchOps.mapMrr(spark, noRel).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L)                // hits_at_k
      assert(r.getDouble(2) == 0.0)             // prec_at_k
      assert(r.isNullAt(3))                     // ap_at_k guarded
      assert(r.getDouble(4) == 0.0)             // mrr: no first hit
    }
  }
}
