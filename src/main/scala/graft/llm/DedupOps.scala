package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north star;
  * SURVEY.md §2.4): exact, n-gram Jaccard, MinHash-LSH, SimHash,
  * embedding-cosine. The reference has no dedup (its corpus is 500 rows,
  * 00_training_pipeline.py:13) — these are the capability extension, built
  * for the blocking-first discipline that survives 100 TB:
  * NEVER a global cross join; candidates come from equality blocking
  * (fingerprint, LSH band bucket, SimHash band, label+window), so the only
  * shuffles are groupBy/join on those keys, and AQE handles bucket skew.
  */
object DedupOps extends graft.QueryModule {

  /** whitespace-token 3-gram shingles, distinct + sorted (deterministic) */
  private def shingles3(text: Column): Column =
    array_sort(array_distinct(transform(
      sequence(lit(0), size(split(text, " ")) - 3),
      i => concat_ws(" ",
        element_at(split(text, " "), i + 1),
        element_at(split(text, " "), i + 2),
        element_at(split(text, " "), i + 3)))))

  /** Exact dedup: sha2-256 over whitespace-normalized lowercase text,
    * deterministic survivor = min doc_id per fingerprint. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id",
        sha2(regexp_replace(lower($"text"), "\\s+", " "), 256).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keep_id")
  }

  /** N-gram Jaccard near-dup: candidate pairs from (lang, length-bucket)
    * blocking, exact Jaccard over 3-gram shingle sets. Docs shorter than 3
    * tokens are excluded (no shingles). */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", $"lang", floor($"n_chars" / 100).as("lb"),
        shingles3($"text").as("sh"))
    val a = docs.select($"doc_id".as("a_id"), $"lang", $"lb", $"sh".as("a_sh"))
    val b = docs.select($"doc_id".as("b_id"), $"lang", $"lb", $"sh".as("b_sh"))
    a.join(b, Seq("lang", "lb"))
      .filter($"a_id" < $"b_id")
      .withColumn("jaccard",
        size(array_intersect($"a_sh", $"b_sh")).cast("double") /
          size(array_union($"a_sh", $"b_sh")).cast("double"))
      .filter($"jaccard" >= 0.2)
      .select($"a_id", $"b_id", round($"jaccard", 6).as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  /** MinHash signature: k independent hash views of the shingle set via
    * xxhash64(shingle, k); the signature is the per-k minimum. Declared
    * without oracle (hash-impl-specific, SURVEY.md §2.5-4) — planted-dup
    * behavior pinned in DedupSpec. */
  private val K = 64
  private val BANDS = 16 // 16 bands x 4 rows

  private def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(K - 1)),
      k => array_min(transform(sh, s => xxhash64(s, k))))

  /** Candidate pairs whose signatures collide in >=1 of 16 LSH bands,
    * verified by exact shingle Jaccard >= 0.5.
    * Plan shape: explode bands -> shuffle on (band, bandHash) -> in-bucket
    * pairing -> distinct -> verify. Bucket sizes stay tiny because a band
    * hash is 4 chained 64-bit minima. */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", shingles3($"text").as("sh"))
      .withColumn("sig", minhashSig($"sh"))
    val banded = docs.select($"doc_id", $"sh",
      posexplode(array((0 until BANDS).map(b =>
        xxhash64(slice($"sig", b * (K / BANDS) + 1, K / BANDS))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
    val l = banded.select($"band", $"bandhash", $"doc_id".as("a_id"), $"sh".as("a_sh"))
    val r = banded.select($"band", $"bandhash", $"doc_id".as("b_id"), $"sh".as("b_sh"))
    l.join(r, Seq("band", "bandhash"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"a_sh", $"b_sh").distinct()
      .withColumn("jaccard",
        size(array_intersect($"a_sh", $"b_sh")).cast("double") /
          size(array_union($"a_sh", $"b_sh")).cast("double"))
      .filter($"jaccard" >= 0.5)
      .select($"a_id", $"b_id", round($"jaccard", 6).as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  /** 64-bit SimHash over token xxhashes, computed with pure column
    * expressions: bit j of each token hash votes +1/-1 weighted by term
    * frequency (tokens kept with duplicates); the sign of the per-bit sum
    * forms the fingerprint. Near-dups = Hamming distance <= 10 (a one-token
    * edit on a ~15-token doc flips ~7 bits in expectation), candidates
    * blocked on 8 8-bit sub-bands. No oracle (hash-specific). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bits = 64
    val tokHashes = transform(split($"text", " "), t => xxhash64(t))
    // per-bit vote: sum over tokens of (bit set ? 1 : -1)
    val sig = array((0 until bits).map(j =>
      when(aggregate($"th", lit(0),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1)
          .otherwise(-1)) > 0, lit(1)).otherwise(lit(0))): _*)
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", tokHashes.as("th"))
      .filter(size($"th") > 0)
      .withColumn("simbits", sig)
    val banded = docs.select($"doc_id", $"simbits",
      posexplode(array((0 until 8).map(b =>
        concat_ws(",", slice($"simbits", b * 8 + 1, 8))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandkey")
    val l = banded.select($"band", $"bandkey", $"doc_id".as("a_id"), $"simbits".as("a_bits"))
    val r = banded.select($"band", $"bandkey", $"doc_id".as("b_id"), $"simbits".as("b_bits"))
    l.join(r, Seq("band", "bandkey"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"a_bits", $"b_bits").distinct()
      .withColumn("hamming",
        aggregate(zip_with($"a_bits", $"b_bits", (x, y) => abs(x - y)),
          lit(0), (acc, d) => acc + d))
      .filter($"hamming" <= 10)
      .select($"a_id", $"b_id", $"hamming")
      .orderBy($"a_id", $"b_id")
  }

  /** Embedding-cosine near-dup: windowed blocking (same label, id distance
    * <= 100 — deterministic, bounded fan-out), exact cosine in double.
    * Oracle: DuckDB list ops over DOUBLE[] (same left-to-right fold). */
  def embeddingCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val a = emb.select($"vec_id".as("a_id"), $"label", $"embedding".as("a_e"))
    val b = emb.select($"vec_id".as("b_id"), $"label", $"embedding".as("b_e"))
    a.join(b, Seq("label"))
      .filter($"a_id" < $"b_id" && $"b_id" - $"a_id" <= 100)
      .withColumn("cosine", SimSearchOps.cosine($"a_e", $"b_e"))
      .filter($"cosine" >= 0.9)
      .select($"label", $"a_id", $"b_id", round($"cosine", 6).as("cosine"))
      .orderBy($"a_id", $"b_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (exactDedup _),
    "q_dedup_ngram_jaccard" -> (ngramJaccard _),
    "q_dedup_minhash_lsh" -> (minhashLsh _),
    "q_dedup_simhash" -> (simhash _),
    "q_dedup_embedding_cosine" -> (embeddingCosine _))

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies FROM (
        |  SELECT doc_id,
        |         sha256(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents)
        |GROUP BY fp ORDER BY keep_id""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, CAST(floor(n_chars / 100) AS BIGINT) AS lb,
        |    list_sort(list_distinct(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 2),
        |      i -> concat_ws(' ', string_split(text, ' ')[i],
        |                     string_split(text, ' ')[i+1],
        |                     string_split(text, ' ')[i+2])))) AS sh
        |  FROM documents WHERE len(string_split(text, ' ')) >= 3)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)
        |    AS jaccard
        |FROM docs a JOIN docs b
        |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.2
        |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_embedding_cosine" ->
      """SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(a.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        | AND b.vec_id - a.vec_id <= 100
        |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                       CAST(b.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(a.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])))) >= 0.9
        |ORDER BY a_id, b_id""".stripMargin)
}
