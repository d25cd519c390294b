package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** §2.10: the Structured Streaming path (Trigger.AvailableNow over a file
  * source) produces the same windowed aggregate as the batch plan. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed agg: streaming AvailableNow == batch result") {
    val events = Tables.load(spark, sfDir, "events")
    // stream source needs a directory of parquet parts with a static schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(s"$dir/events")
    val batch = EventStream.windowedAgg(spark.read.parquet(s"$dir/events"))
      .orderBy("window_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    EventStream.runAvailableNow(spark, s"$dir/events",
      events.schema, "stream_out")
    val streamed = spark.table("stream_out")
      .orderBy("window_start", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("watermark: aggregate state finalizes and late rows are dropped in append mode") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    def ev(id: Long, ts: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(ts), 1L, "view", v, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 1: window [00:00) data + an 03:10 event pushing the watermark
    // (10 min) past 01:00, finalizing the 00:00 window
    Seq(ev(1, "2024-01-01 00:05:00", 1.0), ev(2, "2024-01-01 00:20:00", 2.0),
      ev(3, "2024-01-01 03:10:00", 9.0))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(s"$dir/ev")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$dir/ev").schema).parquet(s"$dir/ev")
      val q = graft.streaming.EventStream.windowedAgg(
        graft.streaming.EventStream.withWatermark(stream))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/cp")
        .format("parquet").option("path", s"$dir/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // batch 2: a LATE event for the already-finalized 00:00 window
    Seq(ev(4, "2024-01-01 00:40:00", 100.0))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(s"$dir/ev")
    runOnce()
    val out = spark.read.parquet(s"$dir/out")
      .select("window_start", "cnt", "sum_value")
      .as[(String, Long, Double)].collect()
      .map { case (w, c, s) => w -> ((c, s)) }.toMap
    // the 00:00 window was emitted once with the on-time rows only; the late
    // row neither reopened it nor produced a duplicate
    assert(out("2024-01-01 00:00:00") == (2L, 3.0))
  }

  test("streaming dedup: duplicates inside the horizon drop, state evicts after it") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_dd").toString
    def ev(id: Long, ts: String, user: Long) =
      (id, java.sql.Timestamp.valueOf(ts), user, "click", 1.0, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // batch 1: two same-key events 5 min apart (inside the 10-min horizon —
    // the second is a duplicate) + another key at 01:00 that pushes the
    // watermark to 00:50, past the first event's expiration
    Seq(ev(1, "2024-01-01 00:00:00", 1L), ev(2, "2024-01-01 00:05:00", 1L),
      ev(3, "2024-01-01 01:00:00", 2L))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(s"$dir/ev")
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$dir/ev").schema).parquet(s"$dir/ev")
      val q = EventStream.dedupWithinWatermark(
          stream, Seq("user_id", "event_type"))
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$dir/cp")
        .format("parquet").option("path", s"$dir/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // batch 2: the same key again, AFTER its state was evicted → re-emitted
    Seq(ev(4, "2024-01-01 01:00:00", 1L))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(s"$dir/ev")
    runOnce()
    val ids = spark.read.parquet(s"$dir/out")
      .select("event_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L))
  }

  test("stream-stream interval join: streaming == batch, bounded state") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    val events = Tables.load(spark, sfDir, "events").limit(2000)
    events.write.mode("overwrite").parquet(s"$dir/ev")
    val stored = spark.read.parquet(s"$dir/ev")
    val batch = EventStream.clickPurchaseJoin(
        stored.filter($"event_type" === "click"),
        stored.filter($"event_type" === "purchase"), 30)
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSeq.sorted
    def side(tpe: String) = spark.readStream.schema(stored.schema)
      .parquet(s"$dir/ev").filter($"event_type" === tpe)
      .withWatermark("ts", "10 minutes")
    val q = EventStream.clickPurchaseJoin(side("click"), side("purchase"), 30)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/cp")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ssj_out")
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionize: gap splits sessions, ids are contiguous per user") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, 1.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), 1L, 1.0), // >30min gap
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val s = EventStream.sessionize(df).select("event_id", "session_id")
      .as[(Long, Long)].collect().toMap
    assert(s(1L) == 1L && s(2L) == 1L && s(3L) == 2L && s(4L) == 1L)
    val stats = EventStream.sessionStats(df)
    assert(stats.count() == 3)
  }

  test("rolling active users: DAU exact, WAU spans the trailing window") {
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // u1 active days 1+2, u2 day 1 (twice: dedup), u3 day 9 (outside the
    // 7-day window of days 1-2)
    val df = Seq(
      (1L, ts("2024-01-01"), 1L), (2L, ts("2024-01-02"), 1L),
      (3L, ts("2024-01-01"), 2L), (4L, ts("2024-01-01"), 2L),
      (5L, ts("2024-01-09"), 3L)
    ).toDF("event_id", "ts", "user_id")
    val out = EventStream.rollingActiveUsers(df, windowDays = 7)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // only observed days are reported
    assert(out.keySet == Set("2024-01-01", "2024-01-02", "2024-01-09"))
    assert(out("2024-01-01") == ((2L, 2L)))      // u1, u2
    assert(out("2024-01-02") == ((1L, 2L)))      // DAU u1; WAU u1+u2
    // Jan 9: only u3 — Jan 1/2 activity fell out of the 7-day window
    // (Jan 2 is visible through Jan 8, not Jan 9)
    assert(out("2024-01-09") == ((1L, 1L)))
    intercept[IllegalArgumentException](
      EventStream.rollingActiveUsers(df, 0))
  }

  test("funnel: strict in-order matching, per-step monotone counts") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      // u1 completes view→click→purchase in order
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"), (3L, ts(2), 1L, "purchase"),
      // u2 clicks BEFORE viewing — click must not count
      (4L, ts(1), 2L, "view"), (5L, ts(0), 2L, "click"),
      // u3 views only
      (6L, ts(0), 3L, "view"),
      // u4 same-timestamp view/click: event_id breaks the tie in order
      (7L, ts(0), 4L, "view"), (8L, ts(0), 4L, "click"),
      // u5 purchases without ever viewing
      (9L, ts(0), 5L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStream.funnel(df, Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "view", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
    // same-ts events in REVERSE id order do not match
    val rev = Seq(
      (8L, ts(0), 4L, "view"), (7L, ts(0), 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out2 = EventStream.funnel(rev, Seq("view", "click"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out2 == Seq((1L, "view", 1L), (2L, "click", 0L)))
    intercept[IllegalArgumentException](EventStream.funnel(df, Seq.empty))
    intercept[IllegalArgumentException](
      EventStream.funnel(df, Seq("view", "view")))
  }

  test("top session paths: ordered truncated paths, deterministic ranking") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // u1 session: a>b>c (plus a 4th event cut by maxLen=3);
    // u2 session: a>b>c; u3 session: z alone
    val df = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"), (3L, ts(2), 1L, "c"),
      (4L, ts(3), 1L, "d"),
      (5L, ts(0), 2L, "a"), (6L, ts(1), 2L, "b"), (7L, ts(2), 2L, "c"),
      (8L, ts(0), 3L, "z")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStream.topSessionPaths(df, k = 10, maxLen = 3)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a>b>c", 2L), ("z", 1L)))
    // k caps the list after the (count desc, path asc) total order
    val top1 = EventStream.topSessionPaths(df, k = 1, maxLen = 3)
      .as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("a>b>c", 2L)))
  }

  test("anomalousDays: 3-sigma spike flagged, stable days and cold start not") {
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // type 'a': days 1-7 have 10 events each, day 8 spikes to 100;
    // type 'b': constant 5/day — never anomalous (variance 0, count equal)
    val rows =
      (1 to 7).flatMap(d => (1 to 10).map(i =>
        (d * 100L + i, day(d), i.toLong, "a"))) ++
      (1 to 100).map(i => (800L + i, day(8), i.toLong, "a")) ++
      (1 to 8).flatMap(d => (1 to 5).map(i =>
        (9000L + d * 10 + i, day(d), i.toLong, "b")))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = EventStream.anomalousDays(df, window = 7, minPrior = 3)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("a", "2024-01-08")) == ((100L, 7L, 1L))) // the spike
    // stable days: zero variance, zero deviation -> strict > fails -> clean
    assert((1 to 8).forall(d => out(("b", f"2024-01-$d%02d"))._3 == 0L))
    // cold start: days 1-3 of 'a' have < minPrior baseline days
    assert((1 to 3).forall(d => out(("a", f"2024-01-0$d"))._3 == 0L))
    // an in-baseline day with the same count as its history is clean
    assert(out(("a", "2024-01-07")) == ((10L, 6L, 0L)))
    intercept[IllegalArgumentException](
      EventStream.anomalousDays(df, window = 2, minPrior = 3))
  }
}
