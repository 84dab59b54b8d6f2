package graft.streaming

import graft.SparkTestBase

/** Fixture-layout regression for the events STREAM source (the r14
  * verdict's #1 gap): the driver ships events as a single FILE
  * `events.parquet`, production tables (and the synthesized sf1) are
  * DIRECTORY layouts — `eventsStream` must route both correctly,
  * because the glob branch (`pathGlobFilter=events.parquet` over the
  * parent) matches LEAF names only and silently streams ZERO files
  * when pointed at a directory table. Both layouts are driven through
  * the REAL readStream micro-batch path (liveTumbling, AvailableNow)
  * and must equal the batch tumbling aggregate row-for-row. The probe
  * itself goes through Hadoop FileSystem, not java.io.File, so the
  * routing also holds for non-local filesystems. */
class StreamLayoutSpec extends SparkTestBase {

  // sf0001 comes from SparkTestBase

  private def assertMatchesBatch(dir: String): Unit = {
    val live = StreamOps.liveTumbling(spark, dir).collect()
    val batch = StreamOps.tumbling(spark, sf0001).collect()
    assert(live.nonEmpty, "stream produced zero rows — layout mis-route")
    assert(live.length === batch.length)
    assert(live.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("FILE layout: single events.parquet file streams via the glob branch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lay-f").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    assertMatchesBatch(dir)
  }

  test("DIRECTORY layout: a directory events.parquet table streams directly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lay-d").toString
    // a real multi-file directory table (2 part files), the production
    // shape the synthesized sf1 exposed
    spark.read.parquet(s"$sf0001/events.parquet").repartition(2)
      .write.parquet(s"$dir/events.parquet")
    assertMatchesBatch(dir)
  }
}
