package graft.llm

import graft.SparkTestBase

/** Pins q_dedup_semantic (rows-only per SURVEY §2.5 rule 4) against a
  * driver-side brute-force recompute over the SAME persisted IVF cells:
  * the declared keep rule (lowest centroid-sim survives), exhaustiveness
  * over probe-visible pairs (top-2 multi-probe), recall on a planted
  * boundary-straddling pair, and run-to-run determinism.
  */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val tau = 0.4 // FixtureCosineThreshold

  private def dot(x: Array[Float], y: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length && i < y.length) {
      s += x(i).toDouble * y(i).toDouble; i += 1
    }
    s
  }

  /** top-2 probe cells under the impl's (distance, cell) struct order:
    * descending lexicographic on (d, cell). */
  private def top2(ne: Array[Float],
      centroids: Map[Int, Array[Float]]): Set[Int] =
    centroids.toSeq.map { case (c, ctr) => (dot(ne, ctr), c) }
      .sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
        .reverse)
      .take(2).map(_._2).toSet

  test("semantic dedup drops exactly the dominated members of probe-visible pairs") {
    graft.plans.GraftExtensions.register(spark)
    val got = DedupOps.semanticDedup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val gotDropped = got.map(_._1).toSet

    // brute-force the rule from the same persisted index
    val idx = SimSearchOps.buildIvfIndex(spark, sf0001)
    val centroids = spark.read.parquet(s"$idx/centroids")
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Double](1).map(_.toFloat).toArray).toMap
    val vecs = spark.read.parquet(s"$idx/cells")
      .select("cell", "vec_id", "ne")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).toArray))

    val wantDropped = scala.collection.mutable.Set[Long]()
    var qualifyingPairs = 0
    var boundaryPairs = 0
    val scored = vecs.map { case (cell, id, ne) =>
      (id, ne, dot(ne, centroids(cell)), top2(ne, centroids), cell)
    }
    for (i <- scored.indices; j <- scored.indices if i < j) {
      val (aId, aE, aCs, aProbe, aHome) = scored(i)
      val (bId, bE, bCs, bProbe, bHome) = scored(j)
      if ((aProbe & bProbe).nonEmpty && dot(aE, bE) >= tau) {
        qualifyingPairs += 1
        if (aHome != bHome) boundaryPairs += 1
        // the member closer to its centroid is dropped
        if (aCs < bCs || (aCs == bCs && aId < bId)) wantDropped += bId
        else wantDropped += aId
      }
    }
    assert(gotDropped == wantDropped.toSet)
    assert(qualifyingPairs > 0, "fixture must plant semantic duplicates")
    assert(gotDropped.nonEmpty && gotDropped.size < vecs.length,
      "dedup must be non-vacuous and selective")
    // every dropped vec reports a max_cosine at or above the threshold
    got.foreach { case (id, _, nDups, maxCos) =>
      assert(nDups >= 1 && maxCos >= tau - 1e-6, s"vec $id: $nDups/$maxCos")
    }
  }

  test("multi-probe catches a planted boundary-straddling near-dup pair") {
    graft.plans.GraftExtensions.register(spark)
    // three unit centroids; u and v are near-identical but KMeans-split
    // across cells 0 and 1 (each sits closest to its own centroid);
    // w lives near cell 2 and matches nothing. Single-probe SemDeDup
    // (self-join on home cell) can never see (u, v); top-2 probing must.
    def unit(x: Double, y: Double): Array[Float] = {
      val n = math.sqrt(x * x + y * y)
      Array((x / n).toFloat, (y / n).toFloat)
    }
    val c0 = unit(1.0, 0.0)
    val c1 = unit(0.80, 0.60)
    val c2 = unit(-1.0, 0.0)
    val u = unit(1.0, 0.176) // ~10 deg: closest to c0; second probe c1
    val v = unit(1.0, 0.488) // ~26 deg: closest to c1 (~37 deg axis)
    val w = unit(-1.0, 0.05)
    val centroids = Seq((0, c0), (1, c1), (2, c2)).toDF("cell", "center")
    val cells = Seq((0, 10L, u), (1, 11L, v), (2, 12L, w))
      .toDF("cell", "vec_id", "ne")
    // sanity of the planted geometry: homes differ, cosine over tau
    assert(dot(u, c0) > dot(u, c1) && dot(v, c1) > dot(v, c0))
    assert(dot(u, v) >= tau)
    val out = DedupOps.semanticDedupOf(cells, centroids)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // v is closer to its centroid than u is to its own -> v is dropped,
    // reported under v's HOME cell; w untouched
    val uCs = dot(u, c0); val vCs = dot(v, c1)
    val expectDropped = if (uCs < vCs) 11L else 10L
    assert(out.map(_._1).toSet == Set(expectDropped), out.mkString(","))
    assert(out.forall(_._3 == 1L))
  }

  test("semantic dedup is deterministic run to run") {
    graft.plans.GraftExtensions.register(spark)
    val once = DedupOps.semanticDedup(spark, sf0001).collect().toSeq
    val twice = DedupOps.semanticDedup(spark, sf0001).collect().toSeq
    assert(once == twice)
  }
}
