package graft.text

import graft.SparkTestBase

/** Inverted-index retrieval: conjunctive semantics against a driver-side
  * reference, BM25 ranking properties, and the partition-pruned postings
  * scan the 100 TB design depends on. */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf0001)
    .select("doc_id", "text").as[(Long, String)].collect()

  test("keyword search = the driver-side conjunctive reference") {
    val got = SearchOps.keywordSearch(spark, sf0001)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    val want = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val counts = SearchOps.Terms.map(t => toks.count(_ == t))
      if (counts.forall(_ > 0)) Some(id -> counts.sum.toLong) else None
    }.toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture terms must be non-vacuous at sf0.001")
  }

  test("bm25 matches a driver-side double reference on the top-20") {
    val got = SearchOps.bm25TopK(spark, sf0001)
      .select("rank", "doc_id", "score").as[(Int, Long, Double)].collect()
    assert(got.length == 20)
    // driver-side BM25, same constants
    val dl = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
    val n = dl.size
    val avgdl = dl.values.map(_.toLong).sum.toDouble / n
    val tf = docs.map { case (id, t) =>
      id -> SearchOps.Terms.map(q => q -> t.split(" ").count(_ == q)).toMap
    }.toMap
    val df_ = SearchOps.Terms.map(q =>
      q -> tf.values.count(_(q) > 0)).toMap
    def score(id: Long): Double = SearchOps.Terms.map { q =>
      val f = tf(id)(q)
      if (f == 0) 0.0
      else math.log(1.0 + (n - df_(q) + 0.5) / (df_(q) + 0.5)) *
        (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
    }.sum
    got.foreach { case (_, id, s) =>
      assert(math.abs(s - score(id)) < 1e-5, s"doc $id: got $s want ${score(id)}")
    }
    // ranks are (rounded score desc, doc_id) — verify the ordering holds
    got.sliding(2).foreach { case Array((_, idA, sA), (_, idB, sB)) =>
      assert(sA > sB || (sA == sB && idA < idB))
    }
  }

  test("postings scan partition-prunes to the query terms' buckets") {
    val df = SearchOps.keywordSearch(spark, sf0001)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val p = out.toString
    // the bucket IN (...) filter must reach the scan's PartitionFilters —
    // at 100 TB this is what keeps a 3-term query from reading the index
    assert(p.contains("PartitionFilters: [bucket"), p.take(3000))
  }

  test("bm25's global top-20 plans as two-phase TopKPerKey heaps, not a full Sort") {
    val df = SearchOps.bm25TopK(spark, sf0001)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    val p = out.toString
    // keyless RewriteTopKWindow form: a partial heap per mapper + k-row
    // final merge; the Window then ranks 20 rows, not every scored doc
    assert("TopKPerKey \\(".r.findAllIn(p).length >= 2, p.take(3000))
  }
}
