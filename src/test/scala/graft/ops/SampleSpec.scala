package graft.ops

import graft.SparkTestBase

/** Pins the non-oracled sampling operator: same seed -> same rows, and
  * realized fractions within loose binomial bounds. */
class SampleSpec extends SparkTestBase {
  import spark.implicits._

  test("q_ml_train_predict: deterministic fit, predictions in domain, better than chance") {
    val once = MlOps.trainPredict(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val twice = MlOps.trainPredict(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(once.sameElements(twice))
    assert(once.forall(r => r._3 == 0.0 || r._3 == 1.0))
    val acc = once.count(r => r._2 == r._3).toDouble / once.length
    assert(acc > 0.6, s"training-set accuracy $acc")
  }

  test("group split is leakage-free: no user appears in both splits") {
    import org.apache.spark.sql.functions._
    // the property the operator exists for, asserted directly on the
    // row-level assignment (the declared query only shows aggregates)
    val assigned = graft.Tables.events(spark, sf0001)
      .withColumn("split",
        when(pmod(pmod($"user_id", lit(1000L)) * 2654435761L, lit(1000L)) < 800, "train")
          .otherwise("test"))
      .select($"user_id", $"split").distinct()
    val both = assigned.groupBy($"user_id")
      .count().filter($"count" > 1).count()
    assert(both == 0, s"$both users leaked across splits")
    // and both splits are non-empty (the hash actually partitions)
    val splits = MlOps.groupSplit(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "test") &&
      splits.values.forall(_ > 0), splits.toString)
  }

  test("quota sample is nested: quota-10 selection is a prefix of quota-25") {
    import org.apache.spark.sql.functions._
    // stable-hash-order selection means shrinking the quota never swaps
    // members in or out — the curriculum-schedule property
    val q25 = MlOps.quotaSample(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byLang25 = q25.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    byLang25.foreach { case (lang, ids) =>
      assert(ids.length <= 25)
      assert(ids.distinct.length == ids.length, s"$lang: duplicate picks")
    }
    // recompute with quota 10 via the same ordering and compare prefixes
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
      .orderBy(pmod(pmod($"doc_id", lit(1000000007L)) * 2654435761L,
        lit(1000000007L)).asc, $"doc_id".asc)
    val q10 = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0)))
    q10.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      .foreach { case (lang, ids) =>
        assert(ids.sameElements(byLang25(lang).take(ids.length)),
          s"$lang: quota-10 is not a prefix of quota-25")
      }
  }

  test("temperature mix: every language survives, quotas honor the budget") {
    import org.apache.spark.sql.functions._
    val langs = graft.Tables.documents(spark, sf0001)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mix = MlOps.temperatureMix(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val byLang = mix.groupBy(_._1)
    // max(1, .) floor: no language is sampled away entirely
    assert(byLang.keySet == langs.keySet,
      s"missing langs: ${langs.keySet -- byLang.keySet}")
    // the quota column is a per-lang constant and the selection honors it
    byLang.foreach { case (lang, rows) =>
      val quotas = rows.map(_._2).distinct
      assert(quotas.length == 1, s"$lang: non-constant quota $quotas")
      val expected = math.min(quotas.head, langs(lang))
      assert(rows.length == expected,
        s"$lang: ${rows.length} rows, expected min(quota=${quotas.head}, n=${langs(lang)})")
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        s"$lang: rk not contiguous from 1")
    }
    // floor division undershoots by < L; the max(1,·) floors add at most
    // one row per language — total quota stays within budget + L
    val quotaSum = byLang.values.map(_.head._2).sum
    assert(quotaSum <= 200 + langs.size,
      s"quota sum $quotaSum exceeds budget 200 + ${langs.size} langs")
    // flattening (alpha = 0.5): the rarest language's share of the mix
    // strictly exceeds its share of the corpus — the property the
    // operator exists for
    val rarest = langs.minBy(_._2)._1
    val mixShare = byLang(rarest).length.toDouble / mix.length
    val corpusShare = langs(rarest).toDouble / langs.values.sum
    assert(mixShare > corpusShare,
      s"$rarest: mix share $mixShare not above corpus share $corpusShare")
  }

  test("domain mix: declared weights drive shares, availability caps") {
    import org.apache.spark.sql.functions._
    val srcN = graft.Tables.documents(spark, sf0001)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val mix = MlOps.domainMix(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySrc = mix.groupBy(_._1)
    // the max(1,·) floor keeps every source present in the mix
    assert(bySrc.keySet == srcN.keySet,
      s"missing sources: ${srcN.keySet -- bySrc.keySet}")
    bySrc.foreach { case (src, rows) =>
      val quota = rows.map(_._2).distinct
      assert(quota.length == 1, s"$src: non-constant quota $quota")
      // availability cap: quota never exceeds what the source has
      assert(quota.head <= srcN(src), s"$src: quota above availability")
      assert(rows.length == quota.head,
        s"$src: ${rows.length} rows for quota ${quota.head}")
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        s"$src: rk not contiguous from 1")
    }
    // every quota equals the declared formula exactly — asserting the
    // formula (not a derived identity like "4x the weight-1 quota",
    // which only holds for weight totals where integer division
    // cooperates) keeps the test valid under any fixture regeneration
    def tier(s: String): Long = s.stripPrefix("src").toInt match {
      case i if i < 5 => 4L; case i if i < 10 => 2L; case _ => 1L
    }
    val wTotal = srcN.keySet.toSeq.map(tier).sum
    bySrc.foreach { case (s, rows) =>
      val expected = math.min(srcN(s),
        math.max(1L, (tier(s) * 400L) / wTotal))
      assert(rows.head._2 == expected,
        s"$s: quota ${rows.head._2}, formula says $expected (W=$wTotal)")
    }
  }

  test("global shuffle: pos is a permutation, shards balanced, deterministic") {
    import org.apache.spark.sql.functions._
    val n = graft.Tables.documents(spark, sf0001).count()
    val rows = MlOps.globalShuffle(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pos is exactly 1..N (the bucketed two-level rank composes into one
    // gap-free global order) and every doc appears exactly once
    assert(rows.map(_._1).sorted.sameElements(1L to n), "pos not 1..N")
    assert(rows.map(_._3).distinct.length == n, "doc_id not a permutation")
    // round-robin shards differ by at most one row
    val sizes = rows.groupBy(_._2).values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"shard imbalance: $sizes")
    assert(rows.groupBy(_._2).size == math.min(8L, n), "wrong shard count")
    // same input -> same order, run to run
    val again = MlOps.globalShuffle(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sameElements(again), "shuffle order not deterministic")
  }

  test("pack sequences: two-level cumsum equals a driver-side replay; chunks tile") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = MlOps.packSequences(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // independent replay: one sequential pass in doc_id order
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .sortBy(_._1)
    var cum = 0L
    val expected = docs.flatMap { case (id, nt) =>
      val start = cum; cum += nt
      if (nt == 0) None
      else Some((id, nt, start / 512, (cum - 1) / 512,
        (cum - 1) / 512 - start / 512 + 1))
    }
    assert(got.sameElements(expected))
    // tiling: consecutive docs never skip a sequence (concatenation has
    // no holes), and every doc spans exactly the chunks its size implies
    got.sliding(2).foreach {
      case Array((_, _, _, lastA, _), (_, _, firstB, _, _)) =>
        assert(firstB == lastA || firstB == lastA + 1,
          s"gap between seq $lastA and $firstB")
      case _ =>
    }
  }

  test("q_ml_sample_seeded is deterministic and in-bounds") {
    val once = MlOps.sampleSeeded(spark, sf0001).collect()
    val twice = MlOps.sampleSeeded(spark, sf0001).collect()
    assert(once.sameElements(twice))
    val total = graft.Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    once.foreach { r =>
      val (flag, bern) = (r.getString(0), r.getLong(1))
      val frac = bern.toDouble / total(flag)
      assert(frac > 0.05 && frac < 0.16, s"$flag bernoulli frac $frac")
    }
  }

  test("eval metrics agree with a driver-side recompute from the scored rows") {
    val m = MlOps.evalMetrics(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scored = MlOps.trainPredict(spark, sf0001)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    def n(l: Double, p: Double) = scored.count(x => x._1 == l && x._2 == p)
    val (tp, fp, fn, tn) = (n(1, 1), n(0, 1), n(1, 0), n(0, 0))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m("tp") == tp && m("fp") == fp && m("fn") == fn && m("tn") == tn)
    assert(m("accuracy") == r6((tp + tn).toDouble / scored.length))
    assert(m("precision") == r6(tp.toDouble / math.max(tp + fp, 1)))
    assert(m("recall") == r6(tp.toDouble / math.max(tp + fn, 1)))
    assert(m("f1") == r6(2.0 * tp / math.max(2 * tp + fp + fn, 1)))
    assert(tp + fp + fn + tn == scored.length && scored.nonEmpty)
  }

  test("weighted sample leans toward heavy documents and is deterministic") {
    val rows = MlOps.weightedSample(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(rows.length == 100 && rows.map(_._1).toSeq == (1 to 100))
    val corpusMean = graft.Tables.documents(spark, sf0001)
      .agg(org.apache.spark.sql.functions.avg("n_chars"))
      .collect().head.getDouble(0)
    val sampleMean = rows.map(_._3).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"ES sampling must favor heavy docs: $sampleMean <= $corpusMean")
    val again = MlOps.weightedSample(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(rows.sameElements(again))
  }

  test("class weights are the balanced heuristic: weight*k*n == total") {
    val rows = MlOps.classWeights(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val total = rows.map(_._2).sum
    val k = rows.length
    rows.foreach { case (lang, n, w) =>
      val expect = BigDecimal(total.toDouble / (k * n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(w == expect, s"$lang weight $w != $expect")
    }
    // rarest class gets the largest weight
    val byN = rows.sortBy(_._2)
    assert(byN.head._3 == rows.map(_._3).max)
  }

  test("kfold covers all docs with balanced, class-complete folds") {
    val rows = MlOps.kfold(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L, 3L, 4L))
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(rows.map(_._2).sum == nDocs, "folds must partition the corpus")
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    assert(mx <= 2 * mn, s"folds badly skewed: $mn..$mx")
  }

  test("histogram-pair AUC equals the per-row tie-corrected rank AUC") {
    // brute force the Mann-Whitney definition on the raw scored rows:
    // count positive-negative pairs won (+ half-ties), divide by P*N —
    // the bounded-histogram theta-join in the query must agree exactly
    val scored = graft.Tables.documents(spark, sf0001)
      .collect().map { r =>
        val lang = r.getAs[String]("lang")
        val s = r.getAs[Long]("n_chars") % 97
        (if (lang == "en") 1 else 0, s)
      }
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    val num2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expect = BigDecimal(num2.toDouble / (2.0 * pos.length * neg.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = MlOps.evalMetricsSql(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("auc") == expect, s"auc ${m("auc")} != brute-force $expect")
    assert(m("tp") + m("fn") == pos.length.toDouble)
    assert(m("fp") + m("tn") == neg.length.toDouble)
    // calibration bins partition the corpus and rates are in [0,1]
    val cal = MlOps.calibration(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(cal.map(_._2).sum == scored.length)
    assert(cal.forall(c => c._3 >= 0.0 && c._3 <= 1.0))
  }

  test("PPS systematic sample: exact tick budget and heavy-doc multiplicity") {
    // planted corpus: one doc holds ~60% of the total weight, so the
    // tick rule must keep it with multiplicity ~60 — the regime the
    // driver fixture (max weight << W/K) never exercises
    val docs = (Seq((0L, "heavy", 6000L)) ++
      (1L to 40L).map(i => (i, s"doc $i", 100L)))
      .map { case (id, t, n) => (id, t, "en", "s0", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_pps").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = MlOps.ppsSystematicSample(spark, dir)
      .select($"doc_id", $"n_chars", $"n_picks", $"first_tick")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // invariant 1: the tick budget is spent exactly — sum of picks == K
    assert(out.map(_._3).sum == 100L, s"ticks: ${out.map(_._3).sum}")
    // invariant 2: strict proportionality — every pick count is
    // floor(cum*K/W) - floor(prev*K/W) of the declared rule, checked
    // against an independent fold here
    val w = 6000L + 40L * 100L
    var cum = 0L
    val expect = ((0L, 6000L) +: (1L to 40L).map(i => (i, 100L)))
      .flatMap { case (id, n) =>
        val prev = cum; cum += n
        val picks = cum * 100 / w - prev * 100 / w
        if (picks >= 1) Some((id, n, picks, prev * 100 / w + 1)) else None
      }
    assert(out.toSeq == expect,
      s"got ${out.toSeq.take(3)}... want ${expect.take(3)}...")
    // the heavy doc really carries its weight share in multiplicity
    assert(out.head._3 == 60L, s"heavy doc picks: ${out.head._3}")
  }
}
