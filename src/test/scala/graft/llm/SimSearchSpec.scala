package graft.llm

import graft.SparkTestBase

/** LSH-vs-brute-force recall for the approximate top-k path (no oracle —
  * SURVEY.md §2.5-4). */
class SimSearchSpec extends SparkTestBase {
  import spark.implicits._

  test("LSH top-5 recalls most of the exact top-5 on sf0.001") {
    val exact = SimSearchOps.topkBruteForce(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = SimSearchOps.topkLsh(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      val got = approx.getOrElse(q, Set.empty)
      want.intersect(got).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 too low: $mean (per-q: $recalls)")
  }

  test("IVF top-5 recalls most of the exact top-5 on sf0.001") {
    val exact = SimSearchOps.topkBruteForce(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = SimSearchOps.topkIvf(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      want.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // absolute floor, not just >= LSH: a band/cell tuning regression must
    // not be able to hide behind a simultaneously-degraded baseline
    assert(mean >= 0.9, s"mean IVF recall@5 too low: $mean (per-q: $recalls)")
  }

  test("PQ+re-rank top-5 recalls most of the exact top-5 on sf0.001") {
    val exact = SimSearchOps.topkBruteForce(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = SimSearchOps.topkPq(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      want.intersect(approx.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    // absolute floor (see IVF note)
    assert(mean >= 0.9, s"mean PQ recall@5 too low: $mean (per-q: $recalls)")
    // deterministic across runs (seeded codebooks, fixed sample order)
    assert(SimSearchOps.topkPq(spark, sf0001).collect()
      .sameElements(SimSearchOps.topkPq(spark, sf0001).collect()))
  }

  test("HNSW top-5 recall >= LSH recall on sf0.001 (superset by construction)") {
    def recallOf(df: org.apache.spark.sql.DataFrame,
                 exact: Map[Long, Set[Long]]): Double = {
      val got = df.select($"q_id", $"c_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = exact.map { case (q, want) =>
        want.intersect(got.getOrElse(q, Set.empty)).size.toDouble / want.size
      }
      rs.sum / rs.size
    }
    val exact = SimSearchOps.topkBruteForce(spark, sf0001)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lsh = recallOf(SimSearchOps.topkLsh(spark, sf0001), exact)
    val hnsw = recallOf(SimSearchOps.topkHnsw(spark, sf0001), exact)
    assert(hnsw >= lsh, s"hnsw recall $hnsw < lsh recall $lsh")
    // absolute floor (see IVF note)
    assert(hnsw >= 0.9, s"hnsw recall@5 too low: $hnsw")
    // deterministic across runs (seeded planes + hash layers)
    assert(SimSearchOps.topkHnsw(spark, sf0001).collect()
      .sameElements(SimSearchOps.topkHnsw(spark, sf0001).collect()))
  }

  test("brute force is deterministic and returns k=5 per query") {
    val rows = SimSearchOps.topkBruteForce(spark, sf0001).collect()
    assert(rows.length == 50) // 10 queries x 5
    val again = SimSearchOps.topkBruteForce(spark, sf0001).collect()
    assert(rows.sameElements(again))
  }

  test("hard negatives: cross-label only, and really the top-3") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val labels = emb.map(e => e._1 -> e._2).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val got = SimSearchOps.hardNegatives(spark, sf0001)
      .as[(Long, Int, Int, Long, Int, Double)].collect()
    assert(got.length == 30) // 10 queries x 3
    got.foreach { case (q, ql, _, c, cl, _) =>
      assert(ql == labels(q) && cl == labels(c))
      assert(ql != cl, s"same-label pair ($q,$c) leaked in")
    }
    // replay: per query, the true best cross-label cosine is rank 1
    val byQ = got.groupBy(_._1)
    emb.filter(_._1 < 10).foreach { case (q, ql, qe) =>
      val best = emb.filter(_._2 != ql)
        .map { case (c, _, ce) =>
          (BigDecimal.valueOf(cos(qe, ce))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue, c)
        }
        .sortBy { case (s, c) => (-s, c) }.take(3)
      val gotQ = byQ(q).sortBy(_._3).map(r => (r._6, r._4)).toSeq
      assert(gotQ == best.toSeq, s"query $q top-3")
    }
  }

  test("label-noise audit matches a kNN majority-vote replay") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) =>
          acc + p.toDouble * q.toDouble }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val want = emb.filter(_._1 < 100).map { case (q, ql, qe) =>
      val knn = emb.filter(_._1 != q)
        .map { case (c, cl, ce) =>
          (BigDecimal.valueOf(cos(qe, ce))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue, c, cl)
        }
        .sortBy { case (s, c, _) => (-s, c) }.take(5)
      val votes = knn.groupBy(_._3).map { case (l, v) => (l, v.length) }
      val knnLabel = votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
      q -> ((ql, knnLabel, knn.count(_._3 == ql).toLong,
        if (knnLabel != ql) 1 else 0))
    }.toMap
    val got = SimSearchOps.labelNoise(spark, sf0001)
      .as[(Long, Int, Int, Long, Int)].collect()
    assert(got.length == 100)
    got.foreach { case (id, l, kl, na, mm) =>
      assert(want(id) == ((l, kl, na, mm)), s"vec $id")
    }
    // the audit must separate: some agreements and some mismatches
    assert(got.exists(_._5 == 0) && got.exists(_._5 == 1))
  }

  test("cluster-balanced sample keeps exactly the closest CAP per cell") {
    val cap = SimSearchOps.ClusterSampleCap
    val (a2, _) = SimSearchOps.portableKmeansCore(spark, sf0001)
    val assigned = a2.select($"vec_id", $"cell", $"dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kept = SimSearchOps.clusterBalancedSample(spark, sf0001)
      .collect().map(r => (r.getLong(2), r.getLong(0))) // (vec_id, cell)
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val byCell = assigned.groupBy(_._2)
    assert(byCell.nonEmpty && byCell.exists(_._2.length > cap),
      "fixture too small: no cell exceeds the cap, the rule never engages")
    byCell.foreach { case (cell, members) =>
      val want = members.sortBy(m => (m._3, m._1)).take(cap)
        .map(_._1).toSet
      assert(kept.getOrElse(cell, Set.empty) == want,
        s"cell $cell kept ${kept.getOrElse(cell, Set.empty).size} != " +
          s"closest-${want.size} by (dist, vec_id)")
    }
  }
}
