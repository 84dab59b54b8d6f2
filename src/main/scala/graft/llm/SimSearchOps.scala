package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the embeddings
  * table (north star; SURVEY.md §2.4). Two paths:
  *
  *  - brute-force cosine top-k: the exactness baseline. Queries x corpus is
  *    a broadcast join (query set is small by construction); per-query
  *    top-k via window row_number — at scale this becomes per-partition
  *    heaps + a k-row merge, never a global sort of the corpus.
  *  - LSH (random-hyperplane) bucketed top-k: the 100 TB path. Deterministic
  *    seeded hyperplanes; candidates = same sign-bucket in any band;
  *    exact re-rank inside candidates only.
  *
  * All float math is promoted to double and folded left-to-right so the
  * DuckDB oracle (list_dot_product over DOUBLE[]) reproduces it bit-exactly;
  * ranking keys are round(,6) + id so a last-ulp divergence can't flip
  * membership of the top-k set.
  */
object SimSearchOps extends graft.QueryModule {

  /** exact double dot product, left-to-right (matches DuckDB list_dot_product) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-5 neighbors for query vectors vec_id < 10. */
  def topkBruteForce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_e"))
    val corpus = emb.select($"vec_id".as("c_id"), $"embedding".as("c_e"))
    val scored = corpus.join(broadcast(queries), $"q_id" =!= $"c_id")
      .withColumn("score", round(cosine($"q_e", $"c_e"), 6))
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"c_id")
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"c_id", $"score")
      .orderBy($"q_id", $"rk")
  }

  // 24 bands x 5 bits: measured top-5 neighbors in the fixture corpus sit
  // near 60-65deg (p_bit ~ 0.64), so per-band collision ~ 0.64^5 = 0.11 and
  // recall over 24 bands ~ 0.93. bits/band is the scale knob: more bits =
  // smaller candidate buckets (more pruning), fewer = higher recall.
  private val DIMS = 64
  private val LSH_BANDS = 24
  private val BITS_PER_BAND = 5

  /** deterministic hyperplanes: seeded uniform in [-1,1); shipped as a
    * literal array (8 bands x 8 planes x 64 dims ~ 4k doubles — broadcast
    * by Catalyst as a constant, no shuffle). */
  private lazy val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(LSH_BANDS, BITS_PER_BAND, DIMS)(rnd.nextDouble() * 2 - 1)
  }

  /** sign-pattern bucket key of `e` under band `b` */
  private def bandKey(e: Column, b: Int): Column = {
    val bits = (0 until BITS_PER_BAND).map { j =>
      val plane = planes(b)(j)
      val proj = aggregate(
        zip_with(e, lit(plane), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat_ws("", bits: _*)
  }

  /** LSH-bucketed approximate top-5 for vec_id < 10: candidates share a
    * band bucket with the query, then exact cosine re-rank. Declared
    * without oracle (approximate); recall vs brute force pinned in
    * SimSearchSpec. */
  def topkLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
    def withBands(df: DataFrame, idCol: String, eCol: String): DataFrame = {
      val bandCols = array((0 until LSH_BANDS).map(b =>
        struct(lit(b).as("band"), bandKey(col(eCol), b).as("bkey"))): _*)
      df.select(col(idCol), col(eCol), explode(bandCols).as("bk"))
        .select(col(idCol), col(eCol),
          $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    }
    val queries = withBands(
      emb.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"embedding".as("q_e")), "q_id", "q_e")
    val corpus = withBands(
      emb.select($"vec_id".as("c_id"), $"embedding".as("c_e")), "c_id", "c_e")
    val candidates = corpus.join(broadcast(queries), Seq("band", "bkey"))
      .filter($"q_id" =!= $"c_id")
      .select($"q_id", $"q_e", $"c_id", $"c_e").distinct()
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"c_id")
    candidates
      .withColumn("score", round(cosine($"q_e", $"c_e"), 6))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"c_id", $"score")
      .orderBy($"q_id", $"rk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_simsearch_topk" -> (topkBruteForce _),
    "q_simsearch_topk_lsh" -> (topkLsh _))

  def oracle: Map[String, String] = Map(
    "q_simsearch_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    round(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) /
        |      (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                             CAST(q.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
        |                             CAST(c.embedding AS DOUBLE[])))), 6) AS score
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT q_id, rk, c_id, score FROM (
        |  SELECT q_id, c_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |                       ORDER BY score DESC, c_id) AS rk
        |  FROM scored)
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin)
}
