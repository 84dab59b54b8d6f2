package graft.flow

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** End-to-end corpus-curation DAG over the sf0.001 fixture: data-driven
  * batch planning, overlapping re-delivery absorbed by the incremental
  * fp-index chain, dynamic report deps, idempotent re-run. */
class CorpusFlowSpec extends SparkTestBase {

  test("corpus flow: batches planned from data, overlap deduped, report complete") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus").toString, sf0001)
    val root = CorpusFlow.CorpusReport(cfg)
    val executed = Runner.runParallel(root, spark, workers = 2)

    // plan first, report last, the full ladder in between
    assert(executed.head == "PlanBatches")
    assert(executed.last == "CorpusReport")
    val manifest = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest")
    assert(manifest.length >= 3, s"expected >=3 batches: $manifest")
    val n = manifest.length
    assert(executed.count(_.startsWith("DedupBatch")) == n)

    // idempotent re-run executes nothing (O3 across the whole DAG)
    assert(Runner.runParallel(root, spark, workers = 2).isEmpty)

    // cross-batch overlap really deduped: batch i keeps nothing below
    // batch i-1's end boundary (those ids were already indexed)
    (1 until n).foreach { i =>
      val kept = spark.read.parquet(s"${cfg.baseDir}/batch_$i/deduped")
      val prevEnd = manifest(i - 1)._2
      val below = kept.filter($"doc_id" < prevEnd).count()
      assert(below == 0, s"batch $i kept $below docs below $prevEnd")
    }

    // union of deduped batches == first-per-fingerprint survivors of the
    // quality gate over the whole corpus (computed independently here)
    val keptIds = (0 until n).flatMap { i =>
      spark.read.parquet(s"${cfg.baseDir}/batch_$i/deduped")
        .select($"doc_id").collect().map(_.getLong(0))
    }.toSet
    val toks = split($"text", " ")
    val expected = graft.Tables.documents(spark, sf0001)
      .withColumn("n_tokens", size(toks))
      .withColumn("ur", size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
      .filter($"n_tokens" >= 10 && $"ur" >= 0.3)
      .withColumn("fp", sha2(regexp_replace(lower($"text"), "\\s+", " "), 256))
      .groupBy($"fp").agg(min($"doc_id").as("keep"))
      .select($"keep").collect().map(_.getLong(0)).toSet
    assert(keptIds === expected,
      s"kept ${keptIds.size} vs expected ${expected.size}")

    // report: per-lang totals over the mixed batches, quota respected
    val report = spark.read.parquet(s"${cfg.baseDir}/report")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.nonEmpty)
    report.values.foreach(v => assert(v <= cfg.quotaPerLang * n))

    // crash-resume: simulate a run that died right after DedupBatch(1)
    // — batch 1's fp index and everything downstream of it never got
    // written. The resume must rebuild exactly the missing suffix
    // (FpIndex 1.., DedupBatch 2.., MixBatch 2.., the report) and
    // nothing whose target survived; the rebuilt report is identical.
    val before = spark.read.parquet(s"${cfg.baseDir}/report")
      .collect().map(_.toString).sorted.toSeq
    def rmrf(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(Files.delete)
      }
    rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/report"))
    (1 until n).foreach { i =>
      rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/batch_$i/fp_index"))
    }
    (2 until n).foreach { i =>
      rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/batch_$i/deduped"))
      rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/batch_$i/mixed"))
    }
    val resumed = Runner.runParallel(root, spark, workers = 2)
    // the LAST batch's index has no consumer, so resume correctly
    // leaves it unbuilt (pure target-demand laziness)
    assert(resumed.toSet ==
      ((1 until n - 1).map(i => s"FpIndex($i)") ++
        (2 until n).map(i => s"DedupBatch($i)") ++
        (2 until n).map(i => s"MixBatch($i)") ++
        Seq("CorpusReport")).toSet, s"resume ran: $resumed")
    assert(resumed.count(_.startsWith("IngestBatch")) == 0)
    assert(resumed.count(_.startsWith("QualityGate")) == 0)
    val after = spark.read.parquet(s"${cfg.baseDir}/report")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before, "resume changed the report")
  }

  test("corpus flow: planted cross-batch NEAR duplicate dropped by the band-index chain") {
    import spark.implicits._
    // choose a source doc that passes the quality gate AND whose
    // one-token-changed copy verifiably clears the Jaccard 0.5 bar
    // (driver-side shingle check keeps the test robust to fixture text)
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val toks = split($"text", " ")
    val gatePass = graft.Tables.documents(spark, sf0001)
      .withColumn("nt", size(toks))
      .withColumn("ur", size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
      .filter($"nt" >= 20 && $"ur" >= 0.3)
      .orderBy($"doc_id")
      .select($"doc_id", $"text", $"lang", $"source").limit(20).collect()
    val src = gatePass.find { r =>
      val words = r.getString(1).split(" ", -1)
      val near = (words.dropRight(1) :+ "zzzneardup").mkString(" ")
      val (a, b) = (shingleSet(r.getString(1)), shingleSet(near))
      a.intersect(b).size.toDouble / a.union(b).size.toDouble >= 0.6
    }.get
    val srcId = src.getLong(0)
    val nearText = (src.getString(1).split(" ", -1).dropRight(1) :+
      "zzzneardup").mkString(" ")
    val maxId = graft.Tables.documents(spark, sf0001)
      .agg(max($"doc_id")).head.getLong(0)
    val plantId = maxId + 1

    // doctored fixture dir: the sf0.001 documents plus the planted doc
    val dataDir = Files.createTempDirectory("graft_neardup_data").toString
    graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .union(Seq((plantId, nearText, src.getString(2), src.getString(3),
        nearText.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.parquet(s"$dataDir/documents.parquet")

    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_near").toString, dataDir)
    val root = CorpusFlow.CorpusReport(cfg)
    Runner.runParallel(root, spark, workers = 2)
    val n = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest").length
    def ids(sub: String): Set[Long] = (0 until n).flatMap { i =>
      spark.read.parquet(s"${cfg.baseDir}/batch_$i/$sub")
        .select($"doc_id").collect().map(_.getLong(0))
    }.toSet

    // the plant is NOT an exact duplicate: exact dedup keeps it
    val exactKept = ids("deduped")
    assert(exactKept.contains(plantId),
      "plant should survive exact dedup (it is a NEAR dup, not exact)")
    assert(exactKept.contains(srcId))
    // the near-dup chain drops the plant (cross-batch, via BandIndex)
    // and keeps the original
    val nearKept = ids("near_deduped")
    assert(nearKept.contains(srcId), "original must survive near-dedup")
    assert(!nearKept.contains(plantId),
      "planted cross-batch near-duplicate must be dropped")

    // crash-resume across the near-dup chain: kill the band indexes and
    // the last batch's near-dedup output; resume rebuilds exactly the
    // demanded suffix and the kept set is unchanged
    def rmrf(p: java.nio.file.Path): Unit =
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(Files.delete)
      }
    (0 until n).foreach { i =>
      rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/batch_$i/band_index"))
    }
    rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/batch_${n - 1}/near_deduped"))
    rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/batch_${n - 1}/mixed"))
    rmrf(java.nio.file.Paths.get(s"${cfg.baseDir}/report"))
    val resumed = Runner.runParallel(root, spark, workers = 2)
    assert(resumed.toSet ===
      ((0 until n - 1).map(i => s"BandIndex($i)") ++
        Seq(s"NearDupBatch(${n - 1})", s"MixBatch(${n - 1})",
          "CorpusReport")).toSet, s"resume ran: $resumed")
    assert(ids("near_deduped") === nearKept, "resume changed the kept set")
  }

  test("corpus flow: decontamination matches a replay; sequences tile across batches") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_pack").toString, sf0001)
    Runner.runParallel(CorpusFlow.CorpusReport(cfg), spark, workers = 2)
    val n = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest").length

    // --- decontamination: near_deduped minus (eval docs + any-overlap
    // leakers), recomputed driver-side from the raw fixture
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val textById = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val benchShingles = textById.collect {
      case (id, t) if id % 50 == 0 => shingleSet(t) }.flatten.toSet
    var droppedTotal = 0
    (0 until n).foreach { i =>
      val before = spark.read.parquet(s"${cfg.baseDir}/batch_$i/near_deduped")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val after = spark.read
        .parquet(s"${cfg.baseDir}/batch_$i/decontaminated")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val expected = before.filter { id =>
        id % 50 != 0 && shingleSet(textById(id)).intersect(benchShingles).isEmpty
      }
      assert(after === expected, s"batch $i decontamination mismatch")
      droppedTotal += before.size - after.size
    }
    assert(droppedTotal > 0, "decontamination dropped nothing (vacuous)")

    // --- packing: one driver-side replay of the WHOLE token stream
    // (batch order, doc_id within batch) must reproduce every
    // first_seq/last_seq and every ledger row
    var cum = 0L
    (0 until n).foreach { i =>
      val packed = spark.read.parquet(s"${cfg.baseDir}/batch_$i/packed")
        .select($"doc_id", $"n_toks", $"first_seq", $"last_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).sortBy(_._1)
      packed.foreach { case (id, nt, first, last) =>
        assert(nt == textById(id).split(" ").count(_.nonEmpty).toLong,
          s"doc $id token count")
        assert(first == cum / 512, s"doc $id first_seq")
        cum += nt
        assert(last == (cum - 1).max(cum - nt) / 512, s"doc $id last_seq")
      }
      if (i < n - 1) {
        val ledger = spark.read
          .parquet(s"${cfg.baseDir}/batch_$i/token_ledger")
          .head.getLong(0)
        assert(ledger == cum, s"ledger $i: $ledger != $cum")
      } else {
        // the last ledger has no consumer: demand-laziness leaves it
        // unbuilt, like FpIndex/BandIndex of the final batch
        assert(!Files.exists(java.nio.file.Paths.get(
          s"${cfg.baseDir}/batch_$i/token_ledger")))
      }
    }
    assert(cum > 512L, "fixture too small to cross a sequence boundary")

    // --- report totals agree with the packed batches
    val reportToks = spark.read.parquet(s"${cfg.baseDir}/report")
      .agg(org.apache.spark.sql.functions.sum($"total_tokens"))
      .head.getLong(0)
    assert(reportToks == cum, "report total_tokens != packed stream total")

    // --- retention funnel: monotone non-increasing down the ladder,
    // counts equal to direct target reads (missing (batch, stage) rows
    // mean an empty stage output -> treated as 0)
    Runner.run(CorpusFlow.CurationFunnel(cfg), spark)
    val funnel = spark.read.parquet(s"${cfg.baseDir}/funnel")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    val ladder = Seq("raw", "clean", "deduped", "near_deduped",
      "decontaminated", "mixed", "packed")
    (0 until n).foreach { i =>
      ladder.sliding(2).foreach { case Seq(a, b) =>
        val (ca, cb) = (funnel((i, a)), funnel((i, b)))
        val ok = if (b == "packed") cb == ca else cb <= ca
        assert(ok, s"batch $i: $a=$ca -> $b=$cb not monotone")
      }
      val direct = spark.read
        .parquet(s"${cfg.baseDir}/batch_$i/decontaminated").count()
      assert(funnel((i, "decontaminated")) == direct,
        s"batch $i funnel count != direct read")
    }

    // --- drop ledger: (dropped ∪ survivors) PARTITIONS each raw batch,
    // and per-reason counts equal the funnel's stage deltas
    (0 until n).foreach { i =>
      Runner.run(CorpusFlow.DropLedger(cfg, i), spark)
      val ledger = spark.read
        .parquet(s"${cfg.baseDir}/batch_$i/drop_ledger")
        .collect().map(r => r.getLong(0) -> r.getString(1))
      assert(ledger.map(_._1).distinct.length == ledger.length,
        s"batch $i: a doc has two drop reasons")
      val rawIds = spark.read.parquet(s"${cfg.baseDir}/batch_$i/raw")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val packedIds = spark.read.parquet(s"${cfg.baseDir}/batch_$i/packed")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(ledger.map(_._1).toSet ++ packedIds === rawIds,
        s"batch $i: ledger + survivors != raw")
      assert(ledger.map(_._1).toSet.intersect(packedIds).isEmpty,
        s"batch $i: a dropped doc also survived")
      val byReason = ledger.groupBy(_._2).view.mapValues(_.length.toLong)
        .toMap.withDefaultValue(0L)
      val deltas = Map(
        "quality_fail" -> (funnel((i, "raw")) - funnel((i, "clean"))),
        "exact_dup" -> (funnel((i, "clean")) - funnel((i, "deduped"))),
        "near_dup" ->
          (funnel((i, "deduped")) - funnel((i, "near_deduped"))),
        "decontaminated" ->
          (funnel((i, "near_deduped")) - funnel((i, "decontaminated"))),
        "quota_cut" ->
          (funnel((i, "decontaminated")) - funnel((i, "mixed"))))
      deltas.foreach { case (reason, d) =>
        assert(byReason(reason) == d,
          s"batch $i $reason: ledger ${byReason(reason)} != funnel delta $d")
      }
    }
  }

  test("corpus flow: URL-dedup knob heads the ladder, cumulative across batches") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_url").toString, sf0001,
      urlDedup = true)
    val root = CorpusFlow.CurateAll(cfg)
    val executed = Runner.runParallel(root, spark, workers = 2)
    val manifest = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest")
    val n = manifest.length
    assert(executed.count(_.startsWith("UrlDedupBatch")) == n)
    // the LAST index has no consumer yet — it builds on demand when a
    // future batch n arrives (the FpIndex chain behaves the same way)
    assert(executed.count(_.startsWith("UrlIndex")) == n - 1)
    // re-run is a no-op with the knob on too
    assert(Runner.runParallel(root, spark, workers = 2).isEmpty)

    // replay: first-seen-wins per canonical URL, cumulative in batch
    // order, via the CLEAN-form canonicalizer (not the regex chain)
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    def canon(id: Long, src: String, lang: String) =
      s"https://$src.example.com/$lang/doc-${id % 50}?id=${id % 50}"
    val byId = docs.map(d => d._1 -> d).toMap
    val seen = collection.mutable.Set.empty[String]
    var urlDropsTotal = 0L
    manifest.zipWithIndex.foreach { case ((lo, hi), i) =>
      val raw = spark.read.parquet(s"${cfg.baseDir}/batch_$i/raw")
        .select($"doc_id").collect().map(_.getLong(0)).sorted
      val expected = raw.flatMap { id =>
        val (_, src, lang) = byId(id)
        val c = canon(id, src, lang)
        if (seen.add(c)) Some(id) else None
      }.toSet
      val kept = spark.read.parquet(s"${cfg.baseDir}/batch_$i/url_deduped")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === expected, s"batch $i URL dedup mismatch")
      urlDropsTotal += raw.length - kept.size
    }
    assert(urlDropsTotal > 0, "URL dedup dropped nothing (vacuous)")

    // funnel carries the stage at the ladder head and stays monotone
    val funnel = spark.read.parquet(s"${cfg.baseDir}/funnel")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    (0 until n).foreach { i =>
      Seq("raw", "url_deduped", "clean").sliding(2).foreach {
        case Seq(a, b) => assert(funnel((i, a)) >= funnel((i, b)),
          s"batch $i: $a=${funnel((i, a))} < $b=${funnel((i, b))}")
      }
    }
    // the drop ledger attributes URL drops, and the working column
    // never leaks downstream
    val reasons = (0 until n).flatMap { i =>
      spark.read.parquet(s"${cfg.baseDir}/batch_$i/drop_ledger")
        .select($"reason").collect().map(_.getString(0))
    }
    assert(reasons.contains("url_dup"))
    assert(!spark.read.parquet(s"${cfg.baseDir}/batch_0/clean")
      .columns.contains("curl"))
  }

  test("corpus flow: DSIR knob inserts a selection stage matching a Scala replay") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_dsir").toString, sf0001,
      dsirMinMicro = Some(0L))
    val root = CorpusFlow.CurateAll(cfg)
    val executed = Runner.runParallel(root, spark, workers = 2)
    val n = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest").length
    assert(executed.count(_.startsWith("DsirSelectBatch")) == n)
    assert(executed.count(_ == "DsirTable") == 1)
    // re-run is a no-op with the knob on too
    assert(Runner.runParallel(root, spark, workers = 2).isEmpty)

    // λ replay from the raw fixture (the q_ml_dsir_select recipe)
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tgt = (0 until 5).map(i => s"src$i").toSet
    val toks = docs.map { case (id, s, t) =>
      (id, tgt(s), t.split(" ", -1).toSeq) }
    val cnt = collection.mutable.Map[String, (Long, Long)]()
    toks.foreach { case (_, isT, ts) => ts.foreach { t =>
      val (a, b) = cnt.getOrElse(t, (0L, 0L))
      cnt(t) = if (isT) (a + 1, b) else (a, b + 1)
    }}
    val nT = cnt.values.map(_._1).sum
    val nR = cnt.values.map(_._2).sum
    val v = cnt.size.toLong
    val lam = cnt.map { case (t, (ct, cr)) =>
      t -> BigDecimal(math.log(
        ((ct + 1).toDouble / (nT + v).toDouble) /
        ((cr + 1).toDouble / (nR + v).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val srcById = docs.map(d => d._1 -> d._2).toMap
    val toksById = toks.map(t => t._1 -> t._3).toMap
    var droppedTotal = 0
    (0 until n).foreach { i =>
      val dec = spark.read.parquet(s"${cfg.baseDir}/batch_$i/decontaminated")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val sel = spark.read.parquet(s"${cfg.baseDir}/batch_$i/selected")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val expected = dec.filter { id =>
        tgt(srcById(id)) ||
          (toksById(id).map(lam).sum * 1000000).toBigInt.toLong >= 0L
      }
      assert(sel === expected, s"batch $i DSIR selection mismatch")
      droppedTotal += dec.size - sel.size
    }
    assert(droppedTotal > 0, "DSIR selection dropped nothing (vacuous)")

    // the funnel carries the selected stage and stays monotone
    // a fully-emptied stage writes no rows for that batch → count 0
    val funnel = spark.read.parquet(s"${cfg.baseDir}/funnel")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    val ladder = Seq("raw", "clean", "deduped", "near_deduped",
      "decontaminated", "selected", "mixed", "packed")
    (0 until n).foreach { i =>
      ladder.sliding(2).foreach { case Seq(a, b) =>
        assert(funnel((i, a)) >= funnel((i, b)),
          s"batch $i: $a=${funnel((i, a))} < $b=${funnel((i, b))}")
      }
    }
    assert(ladder.exists(s => funnel((0, s)) > 0))
    // and the drop ledger attributes the DSIR drops
    val reasons = (0 until n).flatMap { i =>
      spark.read.parquet(s"${cfg.baseDir}/batch_$i/drop_ledger")
        .select($"reason").collect().map(_.getString(0))
    }
    assert(reasons.contains("dsir_offtarget"))
  }

  test("corpus flow: FORCAST readability ceiling gates the quality pass") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_read").toString, sf0001,
      maxForcastGrade = Some(11.0))
    val root = CorpusFlow.CurateAll(cfg)
    Runner.runParallel(root, spark, workers = 2)
    val manifest = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest")

    // replay the WHOLE gate driver-side: token floor + unique ratio +
    // the q_text_readability FORCAST predicate
    val vowelRun = "[aeiouy]+".r
    def passes(text: String): Boolean = {
      val ws = text.split(" ", -1)
      val mono = ws.count(w => vowelRun.findAllIn(w).size <= 1)
      val grade = 20.0 - 15.0 * mono / ws.length
      ws.length >= 10 &&
        ws.distinct.length.toDouble / ws.length >= 0.3 &&
        grade <= 11.0
    }
    val byId = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var (dropped, kept) = (0L, 0L)
    manifest.indices.foreach { i =>
      val raw = spark.read.parquet(s"${cfg.baseDir}/batch_$i/raw")
        .select($"doc_id").collect().map(_.getLong(0))
      val expected = raw.filter(id => passes(byId(id))).toSet
      val clean = spark.read.parquet(s"${cfg.baseDir}/batch_$i/clean")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(clean === expected, s"batch $i readability gate mismatch")
      dropped += raw.length - clean.size
      kept += clean.size
    }
    // non-vacuous at this bound: the ceiling bites, but not everything
    assert(dropped > 0, "readability ceiling dropped nothing (vacuous)")
    assert(kept > 0, "readability ceiling dropped everything")
  }

  test("corpus flow: image-dedup knob inserts the perceptual stage, crash-resume intact") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_img").toString, sf0001,
      imageDedup = true)
    val root = CorpusFlow.CurateAll(cfg)
    val executed = Runner.runParallel(root, spark, workers = 2)
    val manifest = CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest")
    val n = manifest.length
    assert(executed.count(_.startsWith("ImageDedupBatch")) == n)
    // re-run is a no-op with the knob on too
    assert(Runner.runParallel(root, spark, workers = 2).isEmpty)

    // replay: the stage drops exactly the batch's members of the
    // corpus-wide "larger side of a <=6-Hamming pair" set
    val dropSet = graft.llm.MultimodalOps.imagePhashDedup(spark, sf0001)
      .select($"doc_b").collect().map(_.getLong(0)).toSet
    assert(dropSet.nonEmpty, "no confirmed image pairs (vacuous fixture)")
    var imageDropsTotal = 0L
    (0 until n).foreach { i =>
      val before = spark.read.parquet(s"${cfg.baseDir}/batch_$i/near_deduped")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val after = spark.read.parquet(s"${cfg.baseDir}/batch_$i/image_deduped")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(after === before.diff(dropSet), s"batch $i image dedup mismatch")
      imageDropsTotal += before.size - after.size
    }
    assert(imageDropsTotal > 0, "image stage dropped nothing (vacuous)")

    // funnel carries the stage in ladder position and stays monotone;
    // the ledger attributes the drops
    val funnel = spark.read.parquet(s"${cfg.baseDir}/funnel")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap.withDefaultValue(0L)
    (0 until n).foreach { i =>
      Seq("near_deduped", "image_deduped", "decontaminated")
        .sliding(2).foreach { case Seq(a, b) =>
          assert(funnel((i, a)) >= funnel((i, b)),
            s"batch $i: $a=${funnel((i, a))} < $b=${funnel((i, b))}")
        }
    }
    val imgReasons = (0 until n).map { i =>
      spark.read.parquet(s"${cfg.baseDir}/batch_$i/drop_ledger")
        .filter($"reason" === "image_dup").count()
    }
    assert(imgReasons.sum === imageDropsTotal,
      "ledger image_dup rows != stage drops")

    // crash-resume: kill one batch's image stage and everything
    // downstream of it; the resume rebuilds exactly the missing suffix
    // and nothing upstream
    def rmAll(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmAll)
      f.delete()
    }
    Seq("image_deduped", "decontaminated", "mixed", "packed",
        "token_ledger", "drop_ledger")
      .foreach(s => rmAll(new java.io.File(s"${cfg.baseDir}/batch_1/$s")))
    // downstream ledgers chain across batches; drop the suffix + roots
    (2 until n).foreach { i =>
      Seq("packed", "token_ledger", "drop_ledger")
        .foreach(s => rmAll(new java.io.File(s"${cfg.baseDir}/batch_$i/$s")))
    }
    Seq("funnel", "report", "_curated_ok")
      .foreach(s => rmAll(new java.io.File(s"${cfg.baseDir}/$s")))
    val before1 = spark.read.parquet(s"${cfg.baseDir}/batch_1/near_deduped")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val resumed = Runner.runParallel(root, spark, workers = 2)
    assert(resumed.count(_.startsWith("IngestBatch")) == 0)
    assert(resumed.count(_.startsWith("NearDupBatch")) == 0)
    assert(resumed.contains("ImageDedupBatch(1)"))
    assert(!resumed.contains("ImageDedupBatch(0)"))
    val after1 = spark.read.parquet(s"${cfg.baseDir}/batch_1/image_deduped")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(after1 === before1.diff(dropSet), "resume changed the kept set")

    // knob OFF: no stage dirs, no image_dup reasons (the default-path
    // flows the other tests run already pin this; assert directly)
    val off = CorpusConfig(
      Files.createTempDirectory("graft_corpus_imgoff").toString, sf0001)
    Runner.runParallel(CorpusFlow.CurateAll(off), spark, workers = 2)
    assert(!new java.io.File(s"${off.baseDir}/batch_0/image_deduped").exists())
    val offReasons = spark.read.parquet(s"${off.baseDir}/batch_0/drop_ledger")
      .filter($"reason" === "image_dup").count()
    assert(offReasons === 0L)
  }

  test("corpus flow: mediaConsensus upgrades the stage to the >=2-of-3 policy") {
    import spark.implicits._
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_corpus_cons").toString, sf0001,
      imageDedup = true, mediaConsensus = true)
    Runner.runParallel(CorpusFlow.CurateAll(cfg), spark, workers = 2)
    val n = CorpusFlow
      .readManifest(s"${cfg.baseDir}/batches.manifest").length

    // the stage drops exactly the consensus keep-list's complement
    val keep = graft.llm.MultimodalOps.multimodalKeepList(spark, sf0001)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    var drops = 0L
    (0 until n).foreach { i =>
      val before = spark.read.parquet(s"${cfg.baseDir}/batch_$i/near_deduped")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val after = spark.read.parquet(s"${cfg.baseDir}/batch_$i/image_deduped")
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(after === before.intersect(keep), s"batch $i consensus mismatch")
      drops += before.size - after.size
    }
    assert(drops > 0, "consensus stage dropped nothing (vacuous)")

    // the policy difference is real: any image-only collision doc that
    // the image-only rule would drop SURVIVES under consensus
    val imgOnlyDrops = graft.llm.MultimodalOps.imagePhashDedup(spark, sf0001)
      .filter(!$"planted").select($"doc_b").collect().map(_.getLong(0))
      .filterNot(d => d % 10 == 1).toSet // exclude docs that are replays
    imgOnlyDrops.foreach { d =>
      assert(keep.contains(d),
        s"image-only collision $d was destroyed despite consensus")
    }
    // config guard: consensus without the stage is a misconfiguration
    intercept[IllegalArgumentException] {
      CorpusConfig("/tmp/x", sf0001, mediaConsensus = true)
    }
  }

  test("corpus flow: sparse id space plans only occupied slices") {
    import spark.implicits._
    // two 5-doc clusters a billion ids apart — the re-keyed-shard /
    // ingest-offset shape. A raw-range planner would emit ~13M slices;
    // the occupied-bucket planner must emit one window per cluster
    // (plus at most one straddle), each containing documents.
    val dir = Files.createTempDirectory("graft_sparse").toString
    val docs = ((0L to 4L) ++ (1000000000L to 1000000004L))
      .map(i => (i, s"document number $i with some text", "en", "s0",
        30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cfg = CorpusConfig(
      Files.createTempDirectory("graft_sparse_base").toString, dir,
      sliceSize = 200, overlap = 50)
    CorpusFlow.PlanBatches(cfg).run(spark)
    val manifest =
      CorpusFlow.readManifest(s"${cfg.baseDir}/batches.manifest")
    assert(manifest.length <= 4,
      s"sparse planner fanned out ${manifest.length} slices")
    // every planned slice holds at least one document
    manifest.foreach { case (lo, hi) =>
      val n = spark.read.parquet(s"$dir/documents.parquet")
        .filter($"doc_id" >= lo && $"doc_id" < hi).count()
      assert(n > 0, s"planned slice [$lo,$hi) is empty")
    }
    // and the two clusters are both covered
    Seq(0L, 4L, 1000000000L, 1000000004L).foreach { id =>
      assert(manifest.exists { case (lo, hi) => id >= lo && id < hi },
        s"doc $id not covered by any slice")
    }
  }
}
