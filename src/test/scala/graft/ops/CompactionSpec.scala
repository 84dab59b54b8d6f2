package graft.ops

import graft.SparkTestBase

/** Small-files compaction: rows survive exactly, file counts drop to the
  * row-count-derived target, and a tiny target exercises the
  * multi-file split path. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def report(target: Int) =
    ScanOps.compactionWith(spark, sf0001, target)
      .select("day", "files_before", "files_after", "n_rows",
        "rows_preserved")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))

  test("default target collapses the multi-file pathology to 1 file per day") {
    val rep = report(4096)
    assert(rep.nonEmpty)
    // 8 hash buckets per day; a bucket can be empty on a thin fixture
    // day, but the hottest days must show the full fragmentation
    assert(rep.exists(_._2 == 8), rep.take(3).mkString(","))
    // >= 1, not > 1: a thin fixture day can land in a single hash
    // bucket; the pathology is pinned by the exists(== 8) above
    assert(rep.forall(r => r._2 >= 1 && r._3 == 1L), rep.take(3).mkString(","))
    assert(rep.forall(_._5), "every day must preserve its rows")
    val total = rep.map(_._4).sum
    assert(total == graft.Tables.events(spark, sf0001).count())
  }

  test("a tiny target splits partitions to exactly ceil(rows/target) files") {
    val rep = report(16)
    assert(rep.forall { case (_, _, after, rows, ok) =>
      ok && after == (rows + 15) / 16
    }, rep.take(5).mkString(","))
    assert(rep.exists(_._3 > 1), "some day must actually split")
  }
}
