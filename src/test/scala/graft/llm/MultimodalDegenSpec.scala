package graft.llm

import graft.SparkTestBase

/** Proactive degenerate-input audit of the round-15 multimodal
  * additions (the round-14 discipline applied to this round's own
  * code before an advisor asks): an EMPTY documents table and a
  * single-doc corpus must produce the DEFINED readouts — zero pair
  * rows, a full 9-row zero curve (the dim-side left join contract),
  * per-band zero energies — never a throw. */
class MultimodalDegenSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-e").toString
    Seq.empty[Long].toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val oneDocDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-1").toString
    Seq(5L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("empty corpus: all three dedup ops emit zero pairs, no throw") {
    assert(MultimodalOps.imagePhashDedup(spark, emptyDir).collect().isEmpty)
    assert(MultimodalOps.audioFingerprintDedup(spark, emptyDir)
      .collect().isEmpty)
    assert(MultimodalOps.videoFramehashDedup(spark, emptyDir)
      .collect().isEmpty)
    assert(MultimodalOps.audioEnergy(spark, emptyDir).collect().isEmpty)
  }

  test("empty corpus: the threshold curve still emits all 9 zero rows") {
    val rows = MultimodalOps.imagePhashThresholdCurve(spark, emptyDir)
      .collect()
    assert(rows.length === 9)
    assert(rows.forall(r => r.getLong(1) === 0L && r.getLong(2) === 0L))
  }

  test("single doc: hashes exist, zero pairs (no self-pair)") {
    assert(MultimodalOps.imagePhashDedup(spark, oneDocDir)
      .collect().isEmpty)
    val e = MultimodalOps.audioEnergy(spark, oneDocDir).collect()
    assert(e.length === 8 && e.forall(_.getLong(2) > 0L))
  }
}
