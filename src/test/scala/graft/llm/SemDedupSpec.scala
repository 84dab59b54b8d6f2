package graft.llm

import graft.SparkTestBase

/** Pins q_dedup_semantic (rows-only per SURVEY §2.5 rule 4) against a
  * driver-side brute-force recompute over the SAME persisted IVF cells:
  * the declared keep rule (lowest centroid-sim survives), within-cell
  * exhaustiveness (every qualifying pair loses a member), and run-to-run
  * determinism.
  */
class SemDedupSpec extends SparkTestBase {

  private val tau = 0.4 // FixtureCosineThreshold

  private def dot(x: Array[Float], y: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length && i < y.length) {
      s += x(i).toDouble * y(i).toDouble; i += 1
    }
    s
  }

  test("semantic dedup drops exactly the dominated members of near-dup pairs") {
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
    val cells = spark.read.parquet(s"$idx/cells")
      .select("cell", "vec_id", "ne")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
      .groupBy(_._1)

    val wantDropped = scala.collection.mutable.Set[Long]()
    var qualifyingPairs = 0
    cells.foreach { case (cell, members) =>
      val cs = members.map { case (_, id, ne) =>
        (id, ne, dot(ne, centroids(cell)))
      }
      for (i <- cs.indices; j <- cs.indices if i < j) {
        val (aId, aE, aCs) = cs(i)
        val (bId, bE, bCs) = cs(j)
        if (dot(aE, bE) >= tau) {
          qualifyingPairs += 1
          // the member closer to the centroid is dropped
          if (aCs < bCs || (aCs == bCs && aId < bId)) wantDropped += bId
          else wantDropped += aId
        }
      }
    }
    assert(gotDropped == wantDropped.toSet)
    assert(qualifyingPairs > 0, "fixture must plant semantic duplicates")
    val corpus = cells.valuesIterator.map(_.length).sum
    assert(gotDropped.nonEmpty && gotDropped.size < corpus,
      "dedup must be non-vacuous and selective")
    // every dropped vec reports a max_cosine at or above the threshold
    got.foreach { case (id, _, nDups, maxCos) =>
      assert(nDups >= 1 && maxCos >= tau - 1e-6, s"vec $id: $nDups/$maxCos")
    }
  }

  test("semantic dedup is deterministic run to run") {
    graft.plans.GraftExtensions.register(spark)
    val once = DedupOps.semanticDedup(spark, sf0001).collect().toSeq
    val twice = DedupOps.semanticDedup(spark, sf0001).collect().toSeq
    assert(once == twice)
  }
}
