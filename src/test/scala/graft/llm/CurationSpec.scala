package graft.llm

import graft.SparkTestBase

/** Containment dedup + novelty scoring, checked against driver-side
  * references on the sf0.001 fixture (the declared semantics recomputed
  * in plain Scala). */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def shingles(text: String): Set[String] = {
    val t = text.split(" ", -1)
    if (t.length < 3) Set.empty
    else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
  }

  private lazy val docSh = graft.Tables.documents(spark, sf0001)
    .select("doc_id", "text").as[(Long, String)].collect()
    .map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)

  test("containment = the declared rule recomputed driver-side") {
    val got = DedupOps.containment(spark, sf0001)
      .select("a_id", "b_id", "inter", "containment")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, i, c) => (a, b) -> ((i, c)) }.toMap
    val want = (for {
      (a, sa) <- docSh; (b, sb) <- docSh if a < b
      inter = (sa & sb).size if inter >= 3
      cont = inter.toDouble / math.min(sa.size, sb.size) if cont >= 0.8
    } yield (a, b) -> ((inter.toLong,
      BigDecimal(cont).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble))).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture must plant containment pairs")
  }

  test("containment catches a small doc embedded in a big one that Jaccard misses") {
    // planted: doc 1's 10 shingles all appear among doc 2's 100 —
    // containment 1.0, Jaccard 0.1 (below the 0.2 near-dup threshold);
    // doc 3 is unrelated. The fixture corpus never produces this shape
    // (its near-dups are same-length), which is the operator's point.
    val small = (1 to 10).map(i => s"sh$i")
    val big = (1 to 100).map(i => s"sh$i")
    val other = (200 to 240).map(i => s"sh$i")
    val planted = Seq((1L, small), (2L, big), (3L, other))
      .toDF("doc_id", "sh")
    val out = DedupOps.containmentOf(planted)
      .select("a_id", "b_id", "inter", "containment")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 10L, 1.0)))
    val jaccard = 10.0 / (10 + 100 - 10)
    assert(jaccard < 0.2)
  }

  test("containment df-cutoff: generous maxDf ≡ exact; tiny maxDf prunes candidates") {
    // the declared query's maxDf=100 is generous vs fixture df ≤ ~30, so
    // the cutoff path must equal the no-cutoff exact rule bit-for-bit
    val docs = spark.read.parquet(DedupOps.buildShingleIndex(spark, sf0001))
    val exact = DedupOps.containmentOf(docs)
      .as[(Long, Long, Long, Double)].collect().toSet
    val cut = DedupOps.containmentOf(docs, maxDf = 100)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(cut == exact)
    assert(exact.nonEmpty)
    // and the knob is actually wired: maxDf=0 excludes every shingle
    // from candidate generation, so no pair can reach the verify stage
    val none = DedupOps.containmentOf(docs, maxDf = 0).count()
    assert(none == 0L)
  }

  test("novelty = first-arrival fractions recomputed driver-side") {
    val got = DedupOps.novelty(spark, sf0001)
      .select("doc_id", "n_shingles", "n_novel")
      .as[(Long, Long, Long)].collect().toSet
    val firstOf = docSh.flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    val want = docSh.map { case (id, sh) =>
      (id, sh.size.toLong, sh.count(s => firstOf(s) == id).toLong)
    }.toSet
    assert(got == want)
    // the lowest doc_id with shingles is fully novel by construction
    val minId = docSh.map(_._1).min
    val minRow = want.find(_._1 == minId).get
    assert(minRow._2 == minRow._3)
  }
}
