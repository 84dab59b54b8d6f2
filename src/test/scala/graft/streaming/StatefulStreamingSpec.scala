package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY.md §2.4 "custom state" row):
  * flatMapGroupsWithState keeping a per-user running event count +
  * last-value, emitting an update row per input batch; plus a real
  * file-source readStream over the fixture parquet (availableNow). */
// top-level: encoders can't be derived for test-class inner case classes
final case class Ev(user_id: Long, ts: Timestamp, value: Double)
final case class UserRun(user_id: Long, n: Long, lastValue: Double)

class StatefulStreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("flatMapGroupsWithState keeps per-user running state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    def update(user: Long, evs: Iterator[Ev],
               state: GroupState[UserRun]): Iterator[UserRun] = {
      val sorted = evs.toSeq.sortBy(_.ts.getTime)
      if (sorted.isEmpty) Iterator.empty
      else {
        val prev = state.getOption.getOrElse(UserRun(user, 0L, 0.0))
        val next = UserRun(user, prev.n + sorted.size, sorted.last.value)
        state.update(next)
        Iterator.single(next)
      }
    }
    val out = stream.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
    val q = out.writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      stream.addData(Ev(1, t(0), 10.0), Ev(1, t(1), 11.0), Ev(2, t(0), 5.0))
      q.processAllAvailable()
      stream.addData(Ev(1, t(2), 12.0))
      q.processAllAvailable()
      val rows = spark.table("state_test").as[UserRun].collect()
      // user 1: batch1 -> n=2 last=11.0; batch2 -> n=3 last=12.0 (state kept)
      assert(rows.contains(UserRun(1, 2, 11.0)), rows.mkString(","))
      assert(rows.contains(UserRun(1, 3, 12.0)), rows.mkString(","))
      assert(rows.contains(UserRun(2, 1, 5.0)), rows.mkString(","))
    } finally q.stop()
  }

  test("stateful CUSUM/drawdown: watermark-closed windows fold in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    // base is a multiple of the 15-min window so win starts land on :00
    val base = 1704067200000L // 2024-01-01T00:00Z
    def ev(m: Int, cents: Long) =
      SeriesEvent("a", new Timestamp(base + m * 60000L), cents)
    val s = MemoryStream[SeriesEvent]
    val out = s.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamOps.cusumUpdate)
    val q = out.toDF().writeStream.format("memory").queryName("cusum_state")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: three windows open; watermark after = 31−10 = 21 min
      s.addData(ev(1, 6000), ev(16, 7000), ev(31, 2000))
      q.processAllAvailable()
      // batch 2: advances the watermark to 51 min → closes w0..w30
      s.addData(ev(61, 9000))
      q.processAllAvailable()
      // batch 3: a LATE row for the already-closed first window (the
      // watermark contract drops it — engine filter first, the fold's
      // closedThroughMs guard as defense in depth), an OUT-OF-ORDER
      // row still inside the horizon (55 min > wm 51) landing in the
      // not-yet-seen 45-min window, a second row merging into the
      // 60-min bucket, and a horizon-pusher (wm → 80 min)
      s.addData(ev(5, 9999), ev(55, 30000), ev(62, 4000), ev(90, 100))
      q.processAllAvailable()
      val rows = spark.table("cusum_state").as[SeriesOut].collect()
        .sortBy(_.win_start_ms)
      // hand-folded batch twin: S_t = max(0, S_{t−1} + rev − 5000),
      // peak/drawdown running over CLOSED windows in event-time order;
      // the 90-min window stays open (inside the watermark horizon)
      def w(m: Int) = base + m * 60000L
      val expected = Seq(
        SeriesOut("a", w(0),  6000L,  1000L,  0, 6000L,  0L),
        SeriesOut("a", w(15), 7000L,  3000L,  0, 7000L,  0L),
        SeriesOut("a", w(30), 2000L,  0L,     0, 7000L,  5000L),
        SeriesOut("a", w(45), 30000L, 25000L, 1, 30000L, 0L),
        SeriesOut("a", w(60), 13000L, 33000L, 1, 30000L, 17000L))
      assert(rows.toSeq === expected, rows.mkString("\n"))
      // the late row was discarded: the closed first window kept its
      // original revenue and no duplicate emission exists
      assert(rows.count(_.win_start_ms == w(0)) === 1)
    } finally q.stop()
  }

  test("cusumUpdate discards rows for already-closed windows (unit)") {
    import org.apache.spark.sql.streaming.TestGroupState
    val base = 1704067200000L
    // state says everything through the first window is closed; the
    // watermark sits mid-second-window so nothing new can close
    import org.apache.spark.api.java.Optional
    val st = TestGroupState.create[SeriesState](
      optionalState = Optional.of(SeriesState(Map.empty, 1000L, 6000L,
        base + 900000L)),
      timeoutConf = GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(base + 1000000L),
      hasTimedOut = false)
    val late = SeriesEvent("a", new Timestamp(base + 60000L), 9999L)
    val out = StreamOps.cusumUpdate("a", Iterator(late), st).toSeq
    assert(out.isEmpty, out.mkString(","))
    // the late row neither re-opened the window nor moved the fold
    assert(st.get === SeriesState(Map.empty, 1000L, 6000L, base + 900000L))
  }

  test("stream-stream interval join matches only within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val clicks = MemoryStream[Ev]
    val imps = MemoryStream[Ev]
    val l = clicks.toDS().withWatermark("ts", "10 minutes")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"value".as("c_val"))
    val r = imps.toDS().withWatermark("ts", "10 minutes")
      .select($"user_id".as("i_user"), $"ts".as("i_ts"))
    val joined = l.join(r, expr(
      "c_user = i_user AND c_ts BETWEEN i_ts AND i_ts + interval 5 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData(Ev(1, t(0), 0.0))
      clicks.addData(Ev(1, t(2), 1.0)) // within 5 min of the impression
      clicks.addData(Ev(1, t(9), 2.0)) // same user, outside the bound
      clicks.addData(Ev(2, t(2), 3.0)) // no impression at all
      q.processAllAvailable()
      val vals = spark.table("ssj_test").select($"c_val")
        .collect().map(_.getDouble(0)).toSet
      assert(vals == Set(1.0), s"joined: $vals")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses replays across batches") {
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val s = MemoryStream[Ev]
    val out = s.toDS().withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "ts")
    val q = out.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      s.addData(Ev(1, t(0), 1.0), Ev(1, t(0), 1.0)) // in-batch replay
      q.processAllAvailable()
      s.addData(Ev(1, t(0), 1.0)) // cross-batch replay within watermark
      s.addData(Ev(1, t(3), 2.0)) // genuinely new event
      q.processAllAvailable()
      val rows = spark.table("dedup_test").as[Ev].collect()
      assert(rows.length == 2, rows.mkString(","))
      assert(rows.map(_.value).toSet == Set(1.0, 2.0), rows.mkString(","))
    } finally q.stop()
  }

  test("stateful per-window top-k: publish once on closure, late rows dead") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L // 2024-01-01T00:00Z, window-aligned
    def ev(t: String, m: Int, cents: Long) =
      SeriesEvent(t, new Timestamp(base + m * 60000L), cents)
    val s = MemoryStream[SeriesEvent]
    val out = s.toDS()
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => Math.floorDiv(e.ts.getTime, 900000L) * 900000L)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamOps.topkUpdate)
    val q = out.toDF().writeStream.format("memory").queryName("topk_state")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 0 gets FOUR types (so the top-3 cut is real); window 15
      // stays open after batch 2's watermark (31+9−10 = 30)
      s.addData(ev("a", 1, 500), ev("b", 2, 900), ev("c", 3, 700),
        ev("d", 4, 600), ev("a", 5, 300))
      q.processAllAvailable()
      s.addData(ev("a", 40, 100)) // wm → 30 min: closes window 0 only
      q.processAllAvailable()
      val afterClose = spark.table("topk_state").as[TopkOut].collect().toSeq
      assert(afterClose === Seq(
        TopkOut(base, 1, "b", 900L), TopkOut(base, 2, "a", 800L),
        TopkOut(base, 3, "c", 700L)), afterClose.mkString(","))
      // a late row for the PUBLISHED window is a no-op: no re-emission,
      // no fourth row, even though it would have changed the ranking
      s.addData(ev("d", 6, 5000))
      q.processAllAvailable()
      val afterLate = spark.table("topk_state").as[TopkOut].collect().toSeq
      assert(afterLate === afterClose, afterLate.mkString(","))
    } finally q.stop()
  }

  test("file-source readStream (availableNow) matches the batch count") {
    graft.Tables.events(spark, sf0001) // sets the nanosAsLong conf
    val batchCount = graft.Tables.events(spark, sf0001).count()
    // the streaming file source needs a DIRECTORY; select just the events
    // file from the fixture dir with a glob filter
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$sf0001/events.parquet").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf0001)
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.table("file_stream_test").head.getLong(0)
      assert(streamed == batchCount, s"stream=$streamed batch=$batchCount")
    } finally q.stop()
  }
}
