package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** §2.10: the Structured Streaming path (Trigger.AvailableNow over a file
  * source) produces the same windowed aggregate as the batch plan. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed agg: streaming AvailableNow == batch result") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
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
}
