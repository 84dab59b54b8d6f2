package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom typed UDAF surface (SURVEY.md §2.4 "UDF surface" row): an exact
  * median as an `Aggregator[IN, BUF, OUT]`, registered through
  * `functions.udaf`. Median needs all values, so the buffer is the value
  * list — fine for bounded per-group cardinality (orders per status here);
  * sketch aggregates (approx_count_distinct etc.) are the unbounded-group
  * path.
  *
  * Tie rule pinned to DuckDB's `median`: even count -> arithmetic mean of
  * the two middle values, computed in double.
  */
object UdafOps extends graft.QueryModule {

  object ExactMedian extends Aggregator[Double, Array[Double], Double] {
    def zero: Array[Double] = Array.empty
    def reduce(b: Array[Double], a: Double): Array[Double] = b :+ a
    def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = b1 ++ b2
    def finish(b: Array[Double]): Double = {
      if (b.isEmpty) return Double.NaN
      val s = b.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def bufferEncoder: Encoder[Array[Double]] =
      Encoders.javaSerialization[Array[Double]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def medianByStatus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val medianUdaf = udaf(ExactMedian)
    graft.Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(round(medianUdaf($"o_totalprice"), 6).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_udaf_median" -> (medianByStatus _))

  def oracle: Map[String, String] = Map(
    "q_agg_udaf_median" ->
      """SELECT o_orderstatus, round(median(o_totalprice), 6) AS median_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
