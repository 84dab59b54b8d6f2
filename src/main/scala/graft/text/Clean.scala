package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's complete Clean task as a reusable transformation
  * (00_training_pipeline.py:77-89; 01_classification_pipeline.py:94-126):
  * fillna('') → title+" "+selftext → \w+ tokenize → lower → NLTK-stopword
  * filter → Snowball stem → space-join, projected to (id, cleaned_words,
  * subreddit).
  */
object Clean {

  /** Row-level chain (plain Scala) — single source of truth, used by the
    * golden tests and wrapped as the UDF below. Matches the reference's
    * clean_words row function semantics exactly: Python re `\w+` is
    * unicode-aware, hence (?U). */
  def cleanWords(title: String, selftext: String): String = {
    val text =
      Option(title).getOrElse("") + " " + Option(selftext).getOrElse("")
    "(?U)\\w+".r.findAllIn(text)
      .map(_.toLowerCase)
      .filterNot(Stopwords.tokenSet)
      .map(Porter2.stem)
      .mkString(" ")
  }

  private val cleanWordsUdf = udf(cleanWords _)

  /** DataFrame form of the Clean task: raw (id,title,selftext,subreddit) →
    * (id, cleaned_words, subreddit). */
  def apply(raw: DataFrame): DataFrame =
    raw.na.fill("", Seq("title", "selftext"))
      .withColumn("cleaned_words", cleanWordsUdf(col("title"), col("selftext")))
      .select(col("id"), col("cleaned_words"), col("subreddit"))

  val rohSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("selftext", StringType),
    StructField("subreddit", StringType)))

  /** Read a reference-format `;`-csv (header, RFC-4180 double-quote
    * escaping, multiline quoted fields — D7). */
  def readRohCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rohSchema)
      .option("header", true).option("delimiter", ";")
      .option("multiLine", true).option("escape", "\"")
      .csv(path)
}
