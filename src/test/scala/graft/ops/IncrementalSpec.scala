package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental maintenance: CDC diff semantics and merge-equals-recompute. */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshot diff covers A∪B once each, all four statuses non-vacuous") {
    val out = IncrementalOps.snapshotDiff(spark, sf0001)
      .select("doc_id", "status").as[(Long, String)].collect()
    val ids = graft.Tables.documents(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val inA = ids.filter(_ % 5 != 0)
    val inB = ids.filter(_ % 3 != 0)
    assert(out.map(_._1).toSet == (inA ++ inB))
    assert(out.length == (inA ++ inB).size, "one row per doc")
    val byStatus = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus("added") == inB -- inA)
    assert(byStatus("removed") == inA -- inB)
    // changed = revised docs present in both snapshots
    assert(byStatus("changed") == (inA & inB).filter(_ % 11 == 0))
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"))
  }

  test("incremental merge is value-identical to the full recompute") {
    val inc = IncrementalOps.incrementalAgg(spark, sf0001).collect()
    val full = graft.Tables.events(spark, sf0001)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n_events"), AggOps.dsum($"value").as("revenue"))
      .orderBy($"day", $"event_type").collect()
    assert(inc.toSeq == full.toSeq)
    // the artifact really is history-only: strictly fewer days than full
    val histDays = spark.read
      .parquet(IncrementalOps.buildAggIndex(spark, sf0001))
      .select("day").distinct().count()
    val allDays = full.map(_.getDate(0)).distinct.length
    assert(histDays == allDays - 1)
  }

  test("incremental plan reads history from the artifact, events once for the batch") {
    val idx = IncrementalOps.buildAggIndex(spark, sf0001)
    val plan = IncrementalOps.incrementalAgg(spark, sf0001)
      .queryExecution.sparkPlan
    val scanned = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    // the raw table feeds only the newest-day batch (plus the bounded
    // 1-row max-day probe, resolved before planning); history comes
    // from the persisted rollup — that asymmetry IS the operator
    assert(scanned.count(_.contains("events.parquet")) == 1, scanned)
    assert(scanned.exists(_.contains(idx)), scanned)
  }

  test("HLL union of daily sketches equals the direct sketch, near the exact count") {
    val r = IncrementalOps.hllMerge(spark, sf0001).collect().head
    val (nDays, nEvents, merged, direct, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val rawEvents = graft.Tables.events(spark, sf0001).count()
    assert(nDays > 1, "fixture must span multiple days for the merge to matter")
    assert(nEvents == rawEvents)
    // register-max union: merging per-day partials must lose nothing
    assert(merged == direct, s"merged $merged != direct $direct")
    // default lgConfigK=12 => relative error ~1.6%/sqrt(m) band; 5% is loose
    val relErr = math.abs(merged.toDouble - exact) / exact
    assert(relErr < 0.05, s"estimate $merged vs exact $exact (err $relErr)")
  }

  test("theta set algebra is exact below nominal entries, with inclusion-exclusion") {
    val r = IncrementalOps.thetaSets(spark, sf0001).collect().head
    val (estBoth, estEither, estOnlyP) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val (exBoth, exEither, exP, exS) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    // fixture cardinality < nominal entries => sketches are exact
    assert(estBoth == exBoth, s"both $estBoth != $exBoth")
    assert(estEither == exEither, s"either $estEither != $exEither")
    assert(estOnlyP == exP - exBoth, s"diff $estOnlyP != ${exP - exBoth}")
    assert(estEither == exP + exS - estBoth, "inclusion-exclusion")
    assert(exBoth > 0, "overlap must be non-vacuous")
  }

  test("theta set algebra separates planted partially-overlapping cohorts") {
    import spark.implicits._
    // users 1-10 purchase, 6-15 signup: both=5, either=15, only-purchase=5
    // (sf0.001's 15 users all do every event type, so cohort DIFFERENCE
    // needs a planted fixture)
    val rows =
      (1L to 10L).map(u => (u, u, "purchase")) ++
      (6L to 15L).map(u => (u + 100, u, "signup"))
    val dir = java.nio.file.Files.createTempDirectory("graft_theta").toString
    rows.toDF("event_id", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(event_id * 1000000) AS ts",
        "user_id", "event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = IncrementalOps.thetaSets(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 15L, 5L)),
      r.toString)
  }

  /** planted events fixture: one row per (user, event_type) pair */
  private def plantEvents(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    rows.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
      .selectExpr("event_id", "timestamp_micros(event_id * 1000000) AS ts",
        "user_id", "event_type", "CAST(1.0 AS DOUBLE) AS value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("portable HLL: merge == direct bit-exact, LC branch accurate") {
    val r = IncrementalOps.hllPortable(spark, sf0001).collect().head
    val (vZero, estM, estD, exact) =
      (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getLong(5))
    assert(estM == estD, s"merged $estM != direct $estD") // register-max union
    assert(vZero > 0, "sf0.001 must sit in the linear-counting regime")
    val relErr = math.abs(estM - exact) / exact
    assert(relErr < 0.25, s"LC estimate $estM vs exact $exact (err $relErr)")
  }

  test("portable HLL: raw branch (planted 1000 users) within 3-sigma") {
    // 1000 users over m=256 registers: raw estimate > 2.5m, so the
    // harmonic-mean branch runs; 3 sigma for m=256 is ~19.5%
    val dir = plantEvents((1L to 1000L).map(u => (u, "purchase")))
    val r = IncrementalOps.hllPortable(spark, dir).collect().head
    val (estM, estD, exact) = (r.getDouble(3), r.getDouble(4), r.getLong(5))
    assert(estM == estD)
    val relErr = math.abs(estM - exact) / exact
    assert(relErr < 0.25, s"raw estimate $estM vs exact $exact (err $relErr)")
  }

  test("portable KMV theta: exact mode below k on sf0.001") {
    val r = IncrementalOps.thetaPortable(spark, sf0001).collect().head
    // 15 users < k=64: every estimate must EQUAL its exact recompute
    assert(r.getDouble(0) == r.getLong(4).toDouble, "purchase")
    assert(r.getDouble(1) == r.getLong(5).toDouble, "signup")
    assert(r.getDouble(3) == r.getLong(6).toDouble, "intersect")
    assert(r.getDouble(2) == r.getLong(7).toDouble, "union")
  }

  test("portable KMV theta: exact set algebra on planted partial overlap") {
    // 10 purchase, 10 signup, overlap 5 — all below k, so exact
    val dir = plantEvents(
      (1L to 10L).map(u => (u, "purchase")) ++
        (6L to 15L).map(u => (u, "signup")))
    val r = IncrementalOps.thetaPortable(spark, dir).collect().head
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)) ==
      ((10.0, 10.0, 15.0, 5.0)), r.toString)
  }

  test("portable quantile histogram: merge == direct, error <= bin width") {
    val rows = IncrementalOps.quantilePortable(spark, sf0001).collect()
    assert(rows.length == 3)
    val exact = graft.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    rows.foreach { r =>
      val (qbp, t, estM, estD) =
        (r.getLong(0), r.getLong(1), r.getDouble(5), r.getDouble(6))
      assert(estM == estD, s"qbp=$qbp merged $estM != direct $estD")
      assert(t == (exact.length * qbp + 9999) / 10000)
      val exactAtRank = exact(t.toInt - 1)
      assert(math.abs(estM - exactAtRank) <= 4.0,
        s"qbp=$qbp est $estM vs exact $exactAtRank")
    }
  }

  test("portable KMV theta: estimation mode (planted 300-user union)") {
    // 200 purchase, 200 signup, overlap 100: all three samples saturate
    // k=64 so every path is the (k-1)/u_k estimator; sigma ~ 1/sqrt(k-2)
    // ~ 12.7% for the union, looser for the ratio-scaled intersection
    val dir = plantEvents(
      (1L to 200L).map(u => (u, "purchase")) ++
        (101L to 300L).map(u => (u, "signup")))
    val r = IncrementalOps.thetaPortable(spark, dir).collect().head
    val (estU, estI) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs(estU - 300.0) / 300.0 < 0.4, s"union $estU vs 300")
    assert(estI > 0 && estI < estU, s"intersect $estI out of range")
    assert(math.abs(estI - 100.0) / 100.0 < 0.6, s"intersect $estI vs 100")
  }
}
