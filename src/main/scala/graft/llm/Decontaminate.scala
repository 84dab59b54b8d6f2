package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for LLM training corpora (SURVEY.md §2.4
  * capability extension; the reference has no corpus ops — its dataset is
  * 500 rows, 00_training_pipeline.py:13).
  *
  * The training-data problem: any document that shares n-grams with a
  * held-out evaluation set leaks the benchmark into training. The standard
  * remedy (GPT-3 appendix C, The Pile §6.3) is n-gram overlap: flag every
  * corpus document sharing at least one shingle with any benchmark
  * document. Here the benchmark set is the fixture slice `doc_id % 50 = 0`
  * (a stand-in for a real eval suite).
  *
  * 100 TB design: eval suites are tiny (MBs) next to the corpus, so the
  * benchmark shingle set is BROADCAST — the corpus side stays a narrow
  * scan → explode → broadcast-hash-join → partial-count, with no shuffle
  * of corpus text at all. The only wide exchange is the final per-doc
  * count aggregation, keyed on doc_id. At a benchmark too big to
  * broadcast, drop the hint and the same plan degrades to a shuffle join
  * on the shingle key — still posting-sized rows, never full documents.
  */
object Decontaminate extends graft.QueryModule {

  /** whitespace 3-gram shingles, distinct — same contract as
    * DedupOps.shinglesUdf (single linear pass; < 3 tokens → empty). */
  private val shinglesUdf = udf((text: String) => {
    if (text == null) Array.empty[String]
    else {
      val toks = text.split(" ", -1)
      if (toks.length < 3) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]
        var i = 0
        while (i <= toks.length - 3) {
          seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
          i += 1
        }
        val out = new Array[String](seen.size)
        seen.toArray(out)
        out
      }
    }
  })

  /** Corpus docs that overlap the benchmark slice: doc_id + how many
    * distinct shingles leak. Shingles are distinct per doc (UDF contract),
    * so count(*) after the join IS the distinct-overlap count. */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", shinglesUdf($"text").as("sh"))
      .filter(size($"sh") > 0)
    val benchShingles = docs.filter($"doc_id" % 50 === 0)
      .select(explode($"sh").as("shingle")).distinct()
    docs.filter($"doc_id" % 50 =!= 0)
      .select($"doc_id", explode($"sh").as("shingle"))
      .join(broadcast(benchShingles), Seq("shingle"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_leaked_shingles"))
      .orderBy($"doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_dedup_decontaminate" -> (decontaminate _))

  def oracle: Map[String, String] = Map(
    "q_dedup_decontaminate" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 2),
        |      i -> concat_ws(' ', string_split(text, ' ')[i],
        |                     string_split(text, ' ')[i+1],
        |                     string_split(text, ' ')[i+2]))) AS sh
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
        |bench AS (
        |  SELECT DISTINCT unnest(sh) AS shingle FROM docs
        |  WHERE doc_id % 50 = 0),
        |corpus AS (
        |  SELECT doc_id, unnest(sh) AS shingle FROM docs
        |  WHERE doc_id % 50 <> 0)
        |SELECT c.doc_id, COUNT(*) AS n_leaked_shingles
        |FROM corpus c JOIN bench b USING (shingle)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin)
}
