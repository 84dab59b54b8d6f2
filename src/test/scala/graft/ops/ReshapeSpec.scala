package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Shape invariants for the reshaping operators (values are oracled at
  * sf0.01; these pin the structural contracts). */
class ReshapeSpec extends SparkTestBase {
  import spark.implicits._

  test("pivot partitions the row count exactly (no loss, no double-count)") {
    val total = graft.Tables.orders(spark, sf0001).count()
    val pivoted = ReshapeOps.pivotStatus(spark, sf0001)
      .agg(sum($"n_f" + $"n_o" + $"n_p")).head().getLong(0)
    assert(pivoted == total)
  }

  test("unpivot doubles rows and preserves values per metric") {
    val parts = graft.Tables.part(spark, sf0001)
    val long = ReshapeOps.unpivotPart(spark, sf0001)
    assert(long.count() == 2 * parts.count())
    assert(long.select($"metric").distinct().collect().map(_.getString(0)).toSet
      == Set("p_retailprice", "p_size"))
    val k = parts.select(min($"p_partkey")).head().getLong(0)
    val src = parts.filter($"p_partkey" === k)
      .select($"p_retailprice", $"p_size".cast("double")).head()
    val melted = long.filter($"p_partkey" === k)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(melted("p_retailprice") == src.getDouble(0))
    assert(melted("p_size") == src.getDouble(1))
  }

  test("corpus pipeline survivors are gate-compliant and fingerprint-unique") {
    val out = graft.llm.CorpusPipeline.corpusClean(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getInt(2) >= 10))            // n_tokens gate
    assert(out.forall(_.getDouble(3) >= 0.3))        // unique_ratio gate
    assert(out.forall(r => Set("en", "de", "fr")(r.getString(1))))
    // survivors are distinct docs (one per fingerprint by construction)
    assert(out.map(_.getLong(0)).distinct.length == out.length)
  }
}
