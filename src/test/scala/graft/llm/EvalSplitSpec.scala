package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q_pipeline_eval_split: split determinism + non-vacuous decontamination. */
class EvalSplitSpec extends SparkTestBase {
  import spark.implicits._

  test("eval split keeps only sub-threshold-leak eval docs, deterministically") {
    val docs = graft.Tables.documents(spark, sf0001)
    val isTrain =
      pmod(pmod($"doc_id", lit(1000L)) * 2654435761L, lit(1000L)) < 800
    val evalIds = docs.filter(!isTrain).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    val out = Decontaminate.evalSplit(spark, sf0001)
      .collect().map(_.getLong(0))
    // output is a strict, non-empty subset of the eval side: the
    // decontamination dropped something AND kept something (vacuity
    // guard in both directions)
    assert(out.nonEmpty, "every eval doc dropped - threshold vacuous")
    assert(out.length < evalIds.size, "nothing dropped - threshold vacuous")
    assert(out.forall(evalIds.contains), "a train doc leaked into eval")
    // determinism
    val again = Decontaminate.evalSplit(spark, sf0001)
      .collect().map(_.getLong(0))
    assert(out.sameElements(again))
  }
}
