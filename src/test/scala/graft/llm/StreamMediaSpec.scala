package graft.llm

import graft.SparkTestBase

/** Pins the streaming multimodal ingest (r16): the binaryFile
  * readStream → in-flight hash → exactly-once parquet sink → index
  * fold-in chain produces EXACTLY the batch add's result, and the
  * hashes really were committed by the streaming engine (the sink's
  * commit log exists), not by a batch shortcut. */
class StreamMediaSpec extends SparkTestBase {
  import spark.implicits._

  test("stream-ingested dedup equals the batch incremental add") {
    val streamed = MultimodalOps.streamMediaIncremental(spark, sf0001)
      .collect()
    val batch = MultimodalOps.imagePhashDedupIncremental(spark, sf0001)
      .collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)),
      "stream-ingested fold-in diverges from the batch add")
  }

  test("the watched drop directory holds exactly the arriving batch") {
    val dir = new java.io.File(MultimodalOps.streamBatchFilesPath(sf0001))
    assert(dir.isDirectory)
    val names = Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".png"))
    assert(names.nonEmpty)
    val ids = names.map(n => n.stripPrefix("doc_").stripSuffix(".png").toLong)
    assert(ids.forall(id => MultimodalOps.INCR_BATCH.contains(id % 100)),
      "a non-batch doc leaked into the drop directory")
  }
}
