package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Calibration pins for the packed-simhash Hamming prefilter that keeps
  * the embeddingCosineLsh band join sub-quadratic (the r16 verdict's
  * scale-cliff fix). The prefilter is allowed to leak non-qualifying
  * pairs (the exact cosine verify kills them) but must NEVER drop a
  * qualifying pair — the CORRECTNESS oracle proves that end-to-end at
  * both verify scales; this spec pins the MARGIN the guarantee rides on
  * and the bulk-kill rate that makes the fix a fix, so a recalibration
  * of SIG_BITS / SIG_HAMMING_MAX / the plane seed that silently eats
  * the headroom fails here first, with numbers in the message. */
class EmbeddingSigSpec extends SparkTestBase {
  import spark.implicits._

  private val W = SimSearchOps.SIG_WORDS

  test("sig Hamming separates qualifying pairs from the same-label bulk") {
    // 500-row fixture: collect (vec_id, label, embedding, sig) and do the
    // all-pairs census on the driver — the spec needs EVERY same-label
    // pair, including the ones the band join would never materialize.
    val rows = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label", $"embedding",
        SimSearchOps.dedupSigUdf($"embedding").as("sig"))
      .collect()
      .map { r =>
        val sig = r.getStruct(3)
        (r.getLong(0), r.get(1), // label: int in testdata, any equatable
          r.getSeq[Float](2).map(_.toDouble).toArray,
          Array.tabulate(W)(sig.getLong))
      }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    def ham(a: Array[Long], b: Array[Long]): Int = {
      var h = 0; var i = 0
      while (i < W) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
      h
    }
    val pairs = for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if rows(i)._2 == rows(j)._2
    } yield (cos(rows(i)._3, rows(j)._3), ham(rows(i)._4, rows(j)._4))

    val qual = pairs.filter(_._1 >= 0.4)
    assert(qual.nonEmpty, "fixture lost its planted qualifying pairs")
    // margin: the worst qualifying pair must clear the threshold with
    // >= 24 bits (~1.5 sigma at 1024 bits) to spare — a seed or bit-count
    // change that erodes the head-room trips here before the oracle can
    val maxQualH = qual.map(_._2).max
    assert(maxQualH <= SimSearchOps.SIG_HAMMING_MAX - 24,
      s"qualifying-pair Hamming max $maxQualH too close to " +
        s"SIG_HAMMING_MAX ${SimSearchOps.SIG_HAMMING_MAX}")
    // bulk kill: the whole point of the prefilter — most same-label
    // pairs (cos ~ 0 at 64 dims) must die at the popcount, not at the
    // distinct/vector-join/exact-cosine they used to reach
    val passRate = pairs.count(_._2 <= SimSearchOps.SIG_HAMMING_MAX)
      .toDouble / pairs.size
    assert(passRate < 0.25,
      f"prefilter passes $passRate%.3f of same-label pairs — bulk not killed")
  }

  test("prefilter is transparent: LSH pairs == exact all-pairs-in-label") {
    // planted corpus, all three regimes: a clear dup (cos ~ 1), a pair
    // NEAR the 0.40 threshold on both sides, and orthogonal bulk
    val rnd = new scala.util.Random(17)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    def mix(a: Array[Float], b: Array[Float], t: Double): Array[Float] =
      a.zip(b).map { case (x, y) => (x * (1 - t) + y * t).toFloat }
    val v0 = vec()
    val rows = Seq(
      (0L, v0.toSeq, 1L), (1L, mix(v0, vec(), 0.02).toSeq, 1L),
      (2L, mix(v0, vec(), 0.55).toSeq, 1L), // near threshold
      (3L, mix(v0, vec(), 0.75).toSeq, 1L)) ++ // below threshold
      (4L to 60L).map(i => (i, vec().toSeq, 1L))
    val dir = java.nio.file.Files.createTempDirectory("graft_sig").toString
    rows.toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding",
        "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val lsh = DedupOps.embeddingCosineLsh(spark, dir)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact reference: every same-label pair at cos >= 0.4
    val mat = rows.map(r => r._1 -> r._2.map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = rows.map(_._1)
    val exact = (for {
      a <- ids; b <- ids if a < b && cos(mat(a), mat(b)) >= 0.4
    } yield (a, b)).toSet
    assert(exact.nonEmpty && lsh == exact,
      s"blocked=$lsh exact=$exact — prefilter or bands changed the result")
  }
}
