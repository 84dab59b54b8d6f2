package graft.llm

import graft.SparkTestBase

/** The multimodal path: REAL ImageIO decode on genuine image payloads
  * (generated PNGs with known shape and luminance), stub fallback for
  * everything else, plus the plumbing invariants (schema, batching
  * shape, resize/frame-sample contracts). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  /** a w×h PNG: left half black, right half white */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG payloads decode with true dimensions and luminance features") {
    val rows = Seq(
      MultimodalOps.MediaRow(1L, "image", pngBytes(448, 224)),
      MultimodalOps.MediaRow(2L, "image", pngBytes(64, 128)),
      MultimodalOps.MediaRow(3L, "text", "just text bytes".getBytes("UTF-8")))
    val out = MultimodalOps.featuresOf(spark.createDataset(rows))
      .collect().map(r => r.getLong(0) -> r).toMap
    // true decoded dimensions, not stub pseudo-dims
    val one = out(1L)
    assert((one.getInt(2), one.getInt(3)) == ((448, 224)))
    assert((one.getInt(5), one.getInt(6)) == ((224, 112))) // fit 448->224
    val feat = one.getSeq[Float](8)
    // left half black (bands 0-3 ~ 0), right half white (bands 4-7 ~ 1)
    assert(feat.take(4).forall(_ < 0.05f), feat.mkString(","))
    assert(feat.drop(4).forall(_ > 0.95f), feat.mkString(","))
    val two = out(2L)
    assert((two.getInt(2), two.getInt(3)) == ((64, 128)))
    assert((two.getInt(5), two.getInt(6)) == ((112, 224)))
    // non-media payload fell back to the deterministic stub (pseudo-dims)
    assert(out(3L).getInt(2) >= 64)
  }

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
