package graft.llm

import graft.SparkTestBase

/** Planted-duplicate drills for the perceptual image dedup (r15): the
  * dHash/band helpers on REAL decoded PNGs, and the declared query
  * end-to-end on a small fixture corpus — near-identical images must
  * collapse, distinct images must not. */
class ImagePhashSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def decode(bytes: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def hamming(a: Array[Long], b: Array[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("PNG roundtrip is lossless: decoded pixels equal the rendered grid") {
    val img = decode(MultimodalOps.renderGridPng(42L, perturb = false))
    assert(img.getWidth === 9 && img.getHeight === 8)
    for (r <- 0 until 8; c <- 0 until 9)
      assert((img.getRGB(c, r) & 0xff) === MultimodalOps.gridLum(42L, r, c))
  }

  test("dHash: identical image -> 0 bits, one-cell perturbation -> <=2 bits") {
    val base = decode(MultimodalOps.renderGridPng(7L, perturb = false))
    val same = decode(MultimodalOps.renderGridPng(7L, perturb = false))
    val near = decode(MultimodalOps.renderGridPng(7L, perturb = true))
    val other = decode(MultimodalOps.renderGridPng(8L, perturb = false))
    val hb = MultimodalOps.dhashBands(base)
    assert(hamming(hb, MultimodalOps.dhashBands(same)) === 0)
    // one perturbed cell touches at most the two adjacent comparisons
    assert(hamming(hb, MultimodalOps.dhashBands(near)) <= 2)
    // a different base decorrelates completely (~32 of 64 bits)
    assert(hamming(hb, MultimodalOps.dhashBands(other)) > 6)
  }

  test("declared query: planted near-dups collapse, distinct images do not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    // doc_ids 0..29: ids 1, 11, 21 are planted perturbed copies of
    // their predecessors
    (0L until 30L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    val rows = MultimodalOps.imagePhashDedup(spark, dir).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 1L), (10L, 11L), (20L, 21L)).subsetOf(pairs))
    assert(rows.filter(_.getBoolean(3)).length === 3) // exactly the planted
    assert(rows.forall(r => !r.getBoolean(3) || r.getLong(2) <= 2))
  }

  test("hot-bucket cap: a flooded flat-thumbnail bucket yields no pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phash2").toString
    // 0..399: ten flat docs (24, 64, ..., 384) — all render the SAME
    // constant image, so without the cap they'd contribute C(10,2)=45
    // hamming-0 pairs; the bucket (10 > cap 8) is dropped instead
    (0L until 400L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    val rows = MultimodalOps.imagePhashDedup(spark, dir).collect()
    assert(rows.count(_.getBoolean(3)) === 40) // planted survive the cap
    val flatPair = rows.exists(r =>
      r.getLong(0) % 40 == 24 && r.getLong(1) % 40 == 24)
    assert(!flatPair, "capped flat bucket still produced pairs")
  }

  test("threshold curve: 9 monotone rows, planted pairs visible by theta=2") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phash3").toString
    (0L until 30L).toDF("doc_id").write.parquet(s"$dir/documents.parquet")
    val rows = MultimodalOps.imagePhashThresholdCurve(spark, dir).collect()
    assert(rows.length === 9)
    assert(rows.map(_.getLong(0)).toSeq === (0L to 8L))
    val np = rows.map(_.getLong(1))
    assert(np.zip(np.tail).forall { case (a, b) => a <= b }, np.mkString(","))
    assert(np(2) >= 3, s"planted pairs missing at theta=2: ${np.mkString(",")}")
    val ndocs = rows.map(_.getLong(2))
    assert(ndocs(2) >= 6) // each planted pair links 2 docs
  }
}
