package graft.llm

import graft.SparkTestBase

/** Pins the incremental image-dedup contract (r16, the incremental-
  * minhash/IVF discipline on the image axis): the base generation is
  * hashed once and READ, never rebuilt, by the fold-in; the add finds
  * exactly what a full recompute would (parity with the full pipeline
  * restricted to batch-touching pairs); and all three pair directions
  * are exercised by the fixture. */
class IncrementalPhashSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def rmAll(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAll)
    f.delete()
  }

  private def stamps(path: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path)).map(f => f.getPath -> f.lastModified()).toMap
  }

  test("incremental phash: base read-not-rebuilt, parity with full recompute, all 3 directions") {
    val basePath = MultimodalOps.imageIncrBasePath(sf0001)
    rmAll(new java.io.File(basePath))

    val first = MultimodalOps.imagePhashDedupIncremental(spark, sf0001)
      .collect()
    assert(first.nonEmpty)
    val baseStamps = stamps(s"$basePath/hashed")
    assert(baseStamps.nonEmpty)

    // the base generation excludes the batch entirely
    val baseIds = spark.read.parquet(s"$basePath/hashed")
      .select($"doc_id").collect().map(_.getLong(0))
    assert(baseIds.forall(id => !MultimodalOps.INCR_BATCH.contains(id % 100)))

    // a second fold-in reads the same generation byte-for-byte
    val second = MultimodalOps.imagePhashDedupIncremental(spark, sf0001)
      .collect()
    assert(second.map(_.toString).sameElements(first.map(_.toString)))
    assert(stamps(s"$basePath/hashed") === baseStamps,
      "base hash files were rewritten, not read")

    // parity: the full pipeline's pairs restricted to batch-touching
    val full = MultimodalOps.imagePhashDedup(spark, sf0001).collect()
      .filter(r => MultimodalOps.INCR_BATCH.contains(r.getLong(0) % 100) ||
        MultimodalOps.INCR_BATCH.contains(r.getLong(1) % 100))
    assert(first.map(_.toString).sameElements(full.map(_.toString)),
      "incremental fold-in diverges from the full recompute")

    // fixture really exercises all three directions
    val pairs = first.map(r => (r.getLong(0) % 100, r.getLong(1) % 100))
    assert(pairs.contains((40L, 41L)), "batch replay of an indexed base")
    assert(pairs.contains((60L, 61L)), "indexed replay of a batch doc")
    assert(pairs.contains((80L, 81L)), "replay pair wholly inside the batch")
  }
}
