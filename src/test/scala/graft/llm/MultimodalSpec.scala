package graft.llm

import graft.SparkTestBase

/** Plumbing invariants of the multimodal path (the decode itself is a
  * documented stub; what must be REAL: schema, batching shape, and the
  * resize/frame-sample contracts). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media features: schema, determinism, resize + frame-sample bounds") {
    val df = MultimodalOps.mediaFeatures(spark, sf0001)
    assert(df.columns.toSeq == Seq("doc_id", "modality", "width", "height",
      "n_frames", "resized_w", "resized_h", "n_sampled", "feat0"))
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, h) = (r.getInt(2), r.getInt(3))
      val (rw, rh) = (r.getInt(5), r.getInt(6))
      // aspect-preserving fit: longest edge exactly 224, nothing larger
      assert(math.max(rw, rh) == 224, r.toString)
      assert(rw <= 224 && rh <= 224, r.toString)
      assert(r.getInt(7) >= 1 && r.getInt(7) <= 16, s"n_sampled: $r")
      assert(r.getInt(4) >= 1, s"n_frames: $r")
      assert(w >= 64 && h >= 64)
    }
    // deterministic across runs (stub must be a pure function of payload)
    assert(df.collect().sameElements(MultimodalOps.mediaFeatures(spark, sf0001).collect()))
  }

  test("media meta: payload bytes equal utf-8 text length") {
    val metas = MultimodalOps.mediaMeta(spark, sf0001).collect()
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    metas.foreach { r =>
      val want = texts(r.getLong(0)).getBytes("UTF-8").length
      assert(r.getInt(3) == want, s"n_bytes mismatch: $r")
    }
    assert(metas.map(_.getString(1)).toSet.subsetOf(
      Set("image", "audio", "video", "text")))
  }
}
