package graft.text

import graft.SparkTestBase

/** BPE merge-loop semantics pinned on the ACL'16 paper's own fixture
  * plus greedy-apply and tie-break edges. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("Sennrich low/lower/newest/widest fixture learns the textbook merges") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val m = BpeOps.merges(words, rounds = 4)
    // hand-computed: pair counts r1 -> es=9, st=9 tie broken (l,r)-lexic
    // to (e,s); then (es,t)=9; then lo=7, ow=7 tie -> (l,o); then (lo,w)=7
    assert(m == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)))
  }

  test("greedy left-to-right apply never overlaps merged pairs") {
    val words = Seq(("aaaa", 5L)).toDF("word", "freq")
    val m = BpeOps.merges(words, rounds = 10)
    // r1: three (a,a) positions x freq 5 = 15; apply greedily -> [aa, aa]
    // r2: one (aa,aa) position x 5; apply -> [aaaa]; r3: no pairs, stop
    assert(m == Seq(
      (1, "a", "a", "aa", 15L),
      (2, "aa", "aa", "aaaa", 5L)))
  }

  test("loop stops when no pair reaches frequency 2") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    assert(BpeOps.merges(words, rounds = 10).isEmpty)
  }

  test("single-character words contribute no pairs and do not crash") {
    val words = Seq(("a", 100L), ("bc", 3L)).toDF("word", "freq")
    val m = BpeOps.merges(words, rounds = 3)
    assert(m == Seq((1, "b", "c", "bc", 3L)))
  }

  test("applyMerges follows learned order with greedy non-overlap") {
    val table = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    assert(BpeOps.applyMerges("newest", table) == Seq("n", "e", "w", "est"))
    assert(BpeOps.applyMerges("lowest", table) == Seq("low", "est"))
    assert(BpeOps.applyMerges("low", table) == Seq("low"))
    // unknown word falls back to characters
    assert(BpeOps.applyMerges("zq", table) == Seq("z", "q"))
    // a later merge can consume an earlier merge's output, never reorder
    assert(BpeOps.applyMerges("test", table) == Seq("t", "est"))
  }

  test("tokenize counts BPE tokens per doc, never exceeding word chars") {
    val out = BpeOps.bpeTokenize(spark, sf0001).collect()
    assert(out.length ==
      graft.Tables.documents(spark, sf0001).count())
    // merges only ever shrink: n_words <= n_tokens <= total chars
    assert(out.forall(r =>
      r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words")))
    val again = BpeOps.bpeTokenize(spark, sf0001).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("oracle encoding: sentinel-string replace == greedy merge, incl. adversarial cases") {
    // The DuckDB twin (BpeOps.unrolledSql) relies on: encoding symbols
    // as S c1 S S c2 S ... and replacing "S l S S r S" -> "S lr S"
    // reproduces the greedy left-to-right non-overlapping merge,
    // because string replace resumes scanning AFTER each replacement.
    // Java's String.replace has exactly those semantics, so this pins
    // the equivalence driver-side over the adversarial shapes: runs of
    // the same symbol, r-as-prefix-of-next-token traps, multi-char
    // symbols containing each other, and a seeded random sweep.
    val S = ""
    def enc(s: Seq[String]): String = s.map(S + _ + S).mkString
    def dec(s: String): Seq[String] =
      if (s.isEmpty) Seq.empty
      else s.split(S + S).toSeq.map(_.stripPrefix(S).stripSuffix(S))
    def viaReplace(s: Seq[String], l: String, r: String): Seq[String] =
      dec(enc(s).replace(S + l + S + S + r + S, S + l + r + S))
    def viaMerge(s: Seq[String], l: String, r: String): Seq[String] =
      BpeOps.mergeOnce(s, l, r)
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),           // odd run: [aa, a]
      (Seq("a", "a", "a", "a"), "a", "a"),      // even run: [aa, aa]
      (Seq("a", "ab"), "a", "a"),               // prefix trap: no merge
      (Seq("ab", "b", "ab"), "ab", "b"),        // multi-char left
      (Seq("a", "aa", "a"), "a", "aa"),         // symbol contains symbol
      (Seq("aa", "a", "a"), "aa", "a"),         // merged-left re-trap
      (Seq("b", "a", "a", "b", "a", "a"), "a", "a"),
      (Seq.empty[String], "a", "b"),
      (Seq("x"), "x", "x"))
    cases.foreach { case (s, l, r) =>
      assert(viaReplace(s, l, r) == viaMerge(s, l, r),
        s"case $s merge ($l,$r)")
    }
    // seeded random sweep over a tiny alphabet incl. multi-char symbols
    val rnd = new scala.util.Random(42)
    val alpha = Seq("a", "b", "aa", "ab", "ba")
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length)))
      val l = alpha(rnd.nextInt(alpha.length))
      val r = alpha(rnd.nextInt(alpha.length))
      assert(viaReplace(s, l, r) == viaMerge(s, l, r),
        s"random case $s merge ($l,$r)")
    }
  }

  test("declared query returns 10 deterministic steps on the fixture") {
    val out = BpeOps.bpeMerges(spark, sf0001).collect()
    assert(out.map(_.getAs[Int]("step")).toSeq == (1 to 10))
    // merged is always left+right concatenated
    assert(out.forall(r => r.getAs[String]("merged") ==
      r.getAs[String]("left") + r.getAs[String]("right")))
    // frequencies are non-increasing is NOT guaranteed (merges create new
    // pairs), but every merge must have been seen at least twice
    assert(out.forall(_.getAs[Long]("n") >= 2))
    // determinism: a second run reproduces the table exactly
    val again = BpeOps.bpeMerges(spark, sf0001).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
