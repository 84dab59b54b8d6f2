package graft.text

import graft.SparkTestBase

/** Planted-fixture behavior for the segmentation + LM-quality operators:
  * the synthetic corpus has no sentence punctuation (its oracle rows are
  * one sentence per doc), so the real splitting/ordering semantics are
  * pinned here. */
class TextSegmentSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_seg").toString
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("sentences: terminators split, indices stable, empties dropped") {
    val dir = writeDocs(Seq(
      (0L, "First one. Second two! Third three? tail without end"),
      (1L, "no punctuation at all"),
      (2L, "...leading dots. then text")))
    val out = TextOps.sentences(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.filter(_._1 == 0L).map(_._3).toSeq == Seq(
      "First one.", "Second two!", "Third three?", "tail without end"))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq ==
      Seq("no punctuation at all"))
    // leading "..." has no non-terminator chars: skipped, first match
    // keeps its raw-extraction index 0
    assert(out.filter(_._1 == 2L).map(x => (x._2, x._3)).toSeq == Seq(
      (0L, "leading dots."), (1L, "then text")))
  }

  test("unigram logprob: repeated-common-token docs score higher than rare-token docs") {
    val dir = writeDocs(Seq(
      (0L, "common common common common"),
      (1L, "common common common rare")))
    val out = TextOps.unigramLogprob(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // p(common)=7/8, p(rare)=1/8: doc 0 avg ln(7/8) > doc 1's mix
    assert(out(0L) > out(1L), out.toString)
    assert(out(0L) < 0.0) // log-probs are negative
  }
}
