package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline — the realistic 100 TB
  * job this engine exists for (north star; SURVEY.md §2.4): quality
  * scoring -> language gate -> exact dedup, as ONE declarative plan.
  *
  * Scale shape: the scoring/gating stage is a pure narrow map (no
  * shuffle, whole-stage codegen'd, filters reach the scan); the only
  * shuffle is the dedup window on the content fingerprint, which is the
  * minimum any content-dedup must pay. Survivor pick is row_number over
  * (fp, doc_id) — deterministic, and at 100 TB the window beats a
  * groupBy+self-join re-fetch of surviving rows.
  */
object CorpusPipeline extends graft.QueryModule {

  def corpusClean(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    val scored = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        size(toks).as("n_tokens"),
        round(size(array_distinct(toks)).cast("double") /
          size(toks).cast("double"), 6).as("unique_ratio"),
        sha2(regexp_replace(lower($"text"), "\\s+", " "), 256).as("fp"))
      .filter($"n_tokens" >= 10 && $"unique_ratio" >= 0.3 &&
        $"lang".isin("en", "de", "fr"))
    val w = Window.partitionBy($"fp").orderBy($"doc_id")
    scored
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"n_tokens", $"unique_ratio")
      .orderBy($"doc_id")
  }

  /** The NEXT pipeline stage, composed in the same single plan: the
    * cleaned/deduped survivors pack into fixed token-budget training
    * bins per language (greedy running-sum, the q_text_pack shape, fed
    * by the gate->dedup survivors instead of the raw corpus). Still one
    * plan end-to-end: narrow gates -> fp window -> lang running-sum
    * window — two shuffles total, each the minimum its stage can pay. */
  def corpusPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val budget = 2000
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    corpusClean(spark, sfDir)
      .withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"lang", $"n_tokens",
        floor(($"cum" - $"n_tokens") / budget).as("bin"))
      .orderBy($"doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_corpus_clean" -> (corpusClean _),
    "q_pipeline_corpus_pack" -> (corpusPack _))

  def oracle: Map[String, String] = Map(
    "q_pipeline_corpus_clean" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS unique_ratio,
        |    sha256(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM scored
        |  WHERE n_tokens >= 10 AND unique_ratio >= 0.3
        |    AND lang IN ('en', 'de', 'fr')),
        |deduped AS (
        |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM kept)
        |SELECT doc_id, lang, n_tokens, unique_ratio
        |FROM deduped WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_pipeline_corpus_pack" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS unique_ratio,
        |    sha256(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM scored
        |  WHERE n_tokens >= 10 AND unique_ratio >= 0.3
        |    AND lang IN ('en', 'de', 'fr')),
        |deduped AS (
        |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM kept),
        |clean AS (
        |  SELECT doc_id, lang, n_tokens FROM deduped WHERE rn = 1),
        |packed AS (
        |  SELECT doc_id, lang, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM clean)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS bin
        |FROM packed ORDER BY doc_id""".stripMargin)
}
