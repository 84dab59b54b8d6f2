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
}
