package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Duplicate-span dedup: planted-span detection, coverage-exact scrub,
  * and the below-floor / degenerate edges. W = 8 tokens. */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // 10 shared tokens -> three 8-token windows (starts 1..3) per doc
  private val shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"

  test("planted cross-doc span is indexed with its window multiset") {
    val d = docs(
      1L -> s"alpha beta $shared gamma",
      2L -> s"delta $shared epsilon zeta",
      3L -> "unrelated tokens only here nothing repeats at all honestly")
    val idx = SpanDedup.spanIndexOf(d).collect()
    // a shared run of 10 tokens = 3 duplicated 8-windows, each in 2 docs
    assert(idx.length == 3)
    assert(idx.forall(r => r.getAs[Long]("n_docs") == 2 &&
      r.getAs[Long]("n_occ") == 2))
    assert(idx.map(_.getAs[String]("span")).forall(_.split(" ").length == 8))
  }

  test("runs shorter than W stay below the detection floor") {
    val seven = "s1 s2 s3 s4 s5 s6 s7"
    val d = docs(
      1L -> s"$seven filler0 tail1 tail2 tail3 tail4 tail5 tail6 tail7",
      2L -> s"$seven filler1 cap1 cap2 cap3 cap4 cap5 cap6 cap7")
    assert(SpanDedup.spanIndexOf(d).count() == 0)
    // and scrub leaves both docs untouched
    val out = SpanDedup.spanScrubOf(d).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq ==
      d.orderBy("doc_id").collect().map(_.getAs[String]("text")).toSeq)
  }

  test("scrub removes exactly the covered tokens, preserving order") {
    val d = docs(
      1L -> s"alpha beta $shared gamma",
      2L -> s"delta $shared epsilon zeta")
    val out = SpanDedup.spanScrubOf(d).orderBy("doc_id").collect()
    // windows cover the 10 shared tokens and nothing else
    assert(out(0).getAs[String]("text_clean") == "alpha beta gamma")
    assert(out(0).getAs[Long]("n_kept") == 3)
    assert(out(1).getAs[String]("text_clean") == "delta epsilon zeta")
    assert(out(1).getAs[Long]("n_kept") == 3)
  }

  test("identical docs scrub to empty and flag at dup_frac 1.0") {
    val t = s"$shared x11 x12"
    val d = docs(1L -> t, 2L -> t, 3L -> "short doc under window floor")
    val scrub = SpanDedup.spanScrubOf(d).orderBy("doc_id").collect()
    assert(scrub(0).getAs[Long]("n_kept") == 0)
    assert(scrub(0).getAs[String]("text_clean") == "")
    assert(scrub(1).getAs[Long]("n_kept") == 0)
    // the short doc has no windows but survives scrub intact
    assert(scrub(2).getAs[String]("text_clean") == "short doc under window floor")
    val flag = SpanDedup.spanFlagOf(d).collect()
    // only the two identical docs have windows; every window duplicated
    assert(flag.length == 2)
    assert(flag.forall(_.getAs[Double]("dup_frac") == 1.0))
  }

  test("within-doc repetition alone is not cross-doc duplication") {
    val rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    val d = docs(
      1L -> s"$rep $rep", // same 8-window occurs twice in ONE doc
      2L -> "totally different words that never repeat anything else okay")
    assert(SpanDedup.spanIndexOf(d).count() == 0)
  }

  test("incremental flags cross-slice spans only, off the persisted index") {
    // the declared query at fixture scale: every batch doc present,
    // non-vacuous in both directions (some contaminated, some clean)
    val out = SpanDedup.spanIncremental(spark, sf0001).collect()
    val batchIds = graft.Tables.documents(spark, sf0001)
      .filter("doc_id % 3 = 0 and size(split(text, ' ')) >= 8")
      .count()
    assert(out.length == batchIds)
    val dup = out.count(_.getAs[Long]("n_dup_windows") > 0)
    assert(dup > 0, "no cross-slice contamination found - vacuous fixture")
    assert(dup < out.length, "every batch doc contaminated - vacuous fixture")
    // the corpus side comes from the persisted span index: the plan scans
    // documents exactly once (the batch slice), never the corpus text
    val plan = SpanDedup.spanIncremental(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert("documents\\.parquet".r.findAllIn(plan).length == 1,
      s"corpus text re-windowed per batch:\n${plan.take(1500)}")
    assert(plan.contains("graft_span_index"),
      "persisted span index not in the read path")
  }

  test("declared queries run against the fixture with matching shapes") {
    val idx = SpanDedup.spanIndex(spark, sf0001)
    assert(idx.columns.toSeq == Seq("span", "n_docs", "n_occ"))
    val flag = SpanDedup.spanFlag(spark, sf0001)
    assert(flag.columns.toSeq ==
      Seq("doc_id", "n_windows", "n_dup_windows", "dup_frac"))
    val scrub = SpanDedup.spanScrub(spark, sf0001)
    assert(scrub.columns.toSeq == Seq("doc_id", "n_kept", "text_clean"))
    // every fixture doc appears in scrub output
    assert(scrub.count() ==
      graft.Tables.documents(spark, sf0001).count())
  }
}
