package graft.streaming

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming restart-from-checkpoint THROUGH the transactional sink:
  * kill a windowed-aggregate query after its offsets are durable but
  * before its commit marker lands (the crash window Structured
  * Streaming's recovery contract replays), restart from the same
  * checkpoint, and prove the published manifest holds every closed
  * window EXACTLY once — the replayed batch re-runs deterministically
  * (same offset range, same restored state-store version) and the tx
  * sink's idempotent `txid` commit drops the duplicate publish whole.
  *
  * Composes TxSinkSpec's atomicity drill with StatefulStreamingSpec's
  * watermark schedules; the recovery contract is documented in
  * SCALE.md §streaming. */
class TxStreamRestartSpec extends SparkTestBase {
  import spark.implicits._

  private val fmt = "graft.sources.TxManifestSource"

  test("uncommitted batch replays after restart; manifest windows are exactly-once") {
    val work = Files.createTempDirectory("graft_txrestart")
    val srcDir = work.resolve("src"); Files.createDirectories(srcDir)
    val ckpt = work.resolve("ckpt").toString
    val target = work.resolve("table").toString
    val base = 1704067200000L // 2024-01-01T00:00Z, a 15-min boundary

    def addFile(name: String, rows: (Int, String, Long)*): Unit =
      Files.write(srcDir.resolve(name), rows.map { case (min, et, c) =>
        s"""{"ms":${base + min * 60000L},"event_type":"$et","cents":$c}"""
      }.mkString("", "\n", "\n").getBytes("UTF-8"))

    val schema = StructType(Seq(StructField("ms", LongType),
      StructField("event_type", StringType), StructField("cents", LongType)))
    // (batchId, emitted row count) per foreachBatch invocation, across
    // both incarnations of the query
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()

    def startQuery() = {
      val agg = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(srcDir.toString)
        .select(timestamp_millis($"ms").as("ts"), $"event_type", $"cents")
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "15 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
        .select(unix_millis($"w.start").as("win_start_ms"), $"event_type",
          $"n", $"sum_cents")
      agg.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val withId = batch.persist()
          seen.add((batchId, withId.count()))
          // the idempotent-commit contract: version identity = batchId,
          // so a replayed batch publishes zero new rows
          withId.write.format(fmt).option("path", target)
            .option("txid", s"b$batchId").mode("append").save()
          withId.unpersist()
          ()
        }
        .start()
    }

    // windows emit only in DATA batches so the LAST batch of run 1 is the
    // emitting one — the one whose commit marker we destroy
    val prevNoData = spark.conf.getOption(
      "spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      // batch 0: events at minutes 1 and 16 — nothing closed (wm starts 0)
      addFile("f1.json", (1, "a", 100L), (16, "a", 200L))
      // batch 1: minute 45 — wm still 6 from batch 0, nothing closed
      addFile("f2.json", (45, "a", 300L))
      val q1 = startQuery()
      q1.processAllAvailable()
      // batch 2: minute 90 — wm 35 closes w0 and w15, both published
      addFile("f3.json", (90, "a", 400L))
      q1.processAllAvailable()
      q1.stop(); q1.awaitTermination()

      def manifestRows(): Set[(Long, String, Long, Long)] =
        spark.read.format(fmt).option("path", target).load()
          .as[(Long, String, Long, Long)].collect().toSet
      val w0 = (base, "a", 1L, 100L)
      val w15 = (base + 15 * 60000L, "a", 1L, 200L)
      val w45 = (base + 45 * 60000L, "a", 1L, 300L)
      assert(manifestRows() === Set(w0, w15), "run 1 should publish w0+w15")

      // THE CRASH: offsets for the emitting batch are durable, its commit
      // marker is not — precisely the window recovery must replay
      val commits = new java.io.File(s"$ckpt/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).map(_.getName.toLong)
      val last = commits.max
      assert(seen.stream().anyMatch(p => p._1 == last && p._2 == 2L),
        s"the last batch ($last) must be the emitting one: $seen")
      assert(Files.deleteIfExists(Path.of(s"$ckpt/commits/$last")))
      // the local ChecksumFs sidecar rides along with its commit file
      Files.deleteIfExists(Path.of(s"$ckpt/commits/.$last.crc"))

      // restart: the engine re-runs batch `last` from its offset log with
      // the state-store version it started from — same two windows emitted
      val q2 = startQuery()
      q2.processAllAvailable()
      assert(seen.stream().filter(p => p._1 == last).count() === 2L,
        s"batch $last was not replayed: $seen")
      assert(manifestRows() === Set(w0, w15),
        "replayed publish must be dropped by the txid manifest check")

      // life goes on: minute 125 advances wm to 115, closing w45
      addFile("f4.json", (125, "a", 500L))
      q2.processAllAvailable()
      q2.stop(); q2.awaitTermination()
      assert(manifestRows() === Set(w0, w15, w45),
        "post-restart batches publish normally")
      // every closed window appears in exactly one manifest version
      val perVersion = spark.read.format(fmt).option("path", target).load()
        .as[(Long, String, Long, Long)].collect()
      assert(perVersion.length === perVersion.toSet.size,
        s"duplicate rows across versions: ${perVersion.mkString(",")}")
    } finally {
      prevNoData match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
      }
    }
  }
}
