package graft.ops

import graft.SparkTestBase
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._

/** Inference parity against the reference's COMMITTED artifacts: the
  * Spark 2.2.0 PipelineModel at model/1/model scored over each day's
  * cleaned.csv must reproduce the committed ergebnis.csv exactly —
  * ids, subreddit, the full-precision probability vector, prediction,
  * and prediction_label (reference 01_classification_pipeline.py:
  * 179-207). This is the one golden the reference itself provides for
  * the D24 (model load) / D25 (batch inference) rows.
  */
class ModelParitySpec extends SparkTestBase {
  import spark.implicits._

  private val refModel = "/root/reference/model/1/model"
  private val days =
    Seq("02-19-2018", "02-20-2018", "02-21-2018", "02-22-2018")

  test("committed model reproduces all 4 days of committed scores exactly") {
    for (day <- days) {
      val scored = MlOps
        .scoreWithModel(spark, refModel, s"/root/reference/daily/$day/cleaned.csv")
        .select($"id", $"subreddit", vector_to_array($"probability").as("p"),
          $"prediction", $"prediction_label")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getString(1), r.getSeq[Double](2).toList, r.getDouble(3),
            r.getString(4))))
        .toMap
      val golden = spark.read.option("delimiter", ";").option("header", "true")
        .csv(s"/root/reference/daily/$day/ergebnis.csv")
        .collect()
        .map { r =>
          val probs = r.getString(2).stripPrefix("[").stripSuffix("]")
            .split(",").map(_.trim.toDouble).toList
          r.getString(0) ->
            ((r.getString(1), probs, r.getString(3).toDouble, r.getString(4)))
        }
        .toMap
      assert(scored.keySet == golden.keySet, s"$day: id sets differ")
      golden.foreach { case (id, g) =>
        assert(scored(id) == g, s"$day $id: ${scored(id)} != $g")
      }
      assert(golden.nonEmpty)
    }
  }
}
