package graft.ops

import graft.SparkTestBase

/** Turns the Z-order readout into the data-skipping claim itself
  * (r15): a 1/8-of-the-keyspace range probe on EITHER cluster key must
  * intersect far fewer than all 64 cells' min/max intervals — the
  * balanced two-key pruning a single-column sort cannot give — and the
  * clustered write must be lossless and laid out one directory per
  * cell. */
class ZOrderSkipSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("Z-order cells prune a 1/8 range probe on BOTH keys; write lossless") {
    val rows = ScanOps.zorderStats(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 64)

    val li = graft.Tables.lineitem(spark, sf0001)
    val (nLi, pmax, smax) = {
      val r = li.agg(count(lit(1)), max($"l_partkey"), max($"l_suppkey"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(rows.map(_.getLong(1)).sum === nLi, "clustered write lost rows")

    // footer-style pruning: a bucket survives iff its [min,max]
    // interval intersects the probe range [0, max/8]
    val pSurv = rows.count(_.getLong(2) <= pmax / 8) // min_p <= probe hi
    val sSurv = rows.count(_.getLong(4) <= smax / 8) // min_s <= probe hi
    assert(pSurv <= 16, s"partkey probe survived $pSurv of ${rows.length}")
    assert(sSurv <= 16, s"suppkey probe survived $sSurv of ${rows.length}")

    // the comparison point: a partkey-SORTED layout of the same 64
    // buckets prunes the partkey probe perfectly but every bucket
    // spans the full suppkey range — zero pruning on the second key
    val sorted = li.select($"l_partkey", $"l_suppkey")
      .crossJoin(broadcast(li.agg(max($"l_partkey").as("pm"))))
      .withColumn("b", expr("(l_partkey * 64) div (pm + 1)"))
      .groupBy($"b").agg(min($"l_suppkey").as("min_s"))
      .collect()
    val sortedSurv = sorted.count(_.getLong(1) <= smax / 8)
    assert(sortedSurv >= sorted.length - 2,
      "sorted layout unexpectedly prunes the second key")
    assert(sSurv < sortedSurv / 2,
      s"z-order ($sSurv) should beat sorted ($sortedSurv) on key 2")

    // physical layout: one directory per Z-cell — resolve the EXACT
    // directory the collected rows came from (the same sfDir-hash
    // keying ScanOps.tmpDir uses), not a prefix glob that could pick a
    // different scale's leftover when several fixtures share the root
    val zdir = new java.io.File(
      s"${graft.Artifacts.root}/graft_roundtrip/lineitem_zorder_" +
        java.lang.Integer.toHexString(sf0001.hashCode))
    assert(zdir.isDirectory, s"clustered write missing at $zdir")
    val cellDirs = Option(zdir.listFiles()).getOrElse(Array.empty)
      .count(_.getName.startsWith("zbucket="))
    assert(cellDirs === rows.length)
  }

  test("DRIVEN skipping: the parquet reader returns fewer rows under a range probe on either clustered key") {
    // ensure the clustered layout exists (and get its truth counts)
    ScanOps.zorderStats(spark, sf0001).collect()
    val zpath = s"${graft.Artifacts.root}/graft_roundtrip/lineitem_zorder_" +
      java.lang.Integer.toHexString(sf0001.hashCode)
    val li = graft.Tables.lineitem(spark, sf0001)
    val (nLi, pmax, smax) = {
      val r = li.agg(count(lit(1)), max($"l_partkey"), max($"l_suppkey"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    // rows RETURNED BY THE SCAN NODE (after parquet footer/row-group
    // pruning of the pushed range filter, before Spark's re-filter) —
    // the driven twin of the interval arithmetic above
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.executedPlan.executeCollect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }

    val z = spark.read.parquet(zpath)
    val zP = scanRows(z.filter($"l_partkey" <= pmax / 8))
    val zS = scanRows(z.filter($"l_suppkey" <= smax / 8))
    assert(zP < nLi * 2 / 5, s"partkey probe read $zP of $nLi rows")
    assert(zS < nLi * 2 / 5, s"suppkey probe read $zS of $nLi rows")

    // comparison layout: the SAME rows range-sorted on partkey alone —
    // every file spans the full suppkey range, so the suppkey probe
    // prunes nothing at the reader
    val spath = s"${graft.Artifacts.root}/graft_roundtrip/lineitem_psort_" +
      java.lang.Integer.toHexString(sf0001.hashCode)
    li.select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
      .repartitionByRange(16, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(spath)
    val s = spark.read.parquet(spath)
    val sP = scanRows(s.filter($"l_partkey" <= pmax / 8))
    val sS = scanRows(s.filter($"l_suppkey" <= smax / 8))
    assert(sP < nLi * 2 / 5, "sorted layout should prune its own key")
    assert(sS > nLi * 9 / 10,
      s"sorted layout unexpectedly pruned the second key ($sS of $nLi)")
    assert(zS < sS / 2,
      s"z-order reader ($zS rows) should beat sorted ($sS) on key 2")
  }
}
