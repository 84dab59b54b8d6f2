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
}
