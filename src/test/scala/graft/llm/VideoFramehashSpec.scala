package graft.llm

import graft.SparkTestBase

/** Planted-duplicate drill for the frame-table video dedup (r15):
  * replayed videos collapse on ≥3-of-4 sampled frame hashes, the
  * flat test-pattern flood is capped, distinct videos stay apart. */
class VideoFramehashSpec extends SparkTestBase {
  import spark.implicits._

  test("declared query: replayed videos collapse, test-pattern flood capped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vfh").toString
    (0L until 400L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    val rows = MultimodalOps.videoFramehashDedup(spark, dir).collect()
    val planted = rows.filter(_.getBoolean(3))
    assert(planted.length === 40)
    // the perturbation touches only frame 4: at least 3 of the 4
    // sampled frames always hash equal
    assert(planted.forall(r => r.getLong(2) >= 3L && r.getLong(2) <= 4L))
    assert(!rows.exists(r =>
      r.getLong(0) % 40 == 24 && r.getLong(1) % 40 == 24),
      "capped flat bucket still produced video pairs")
  }
}
