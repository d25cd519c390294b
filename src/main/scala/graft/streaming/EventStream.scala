package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming/incremental semantics over the `events` table (SURVEY §2.10).
  *
  * The reference's "streaming" is batch polling (Invoke-ScheduledSync,
  * Sync.ps1:774-809) — covered by `Trigger.AvailableNow`. Beyond parity, the
  * natural Spark extensions: watermarked tumbling-window aggregation and
  * gap-based sessionization. Both transforms are expressed once and run
  * identically in batch (used by the correctness oracle) and as a
  * Structured Streaming query.
  */
object EventStream {

  /** Tumbling-window aggregation: per (hour, event_type) counts and exact
    * decimal sums. Works on a batch OR streaming DataFrame; on streaming
    * inputs pair with [[withWatermark]]. Window start is emitted as a
    * formatted string so batch/oracle comparisons are timezone-stable. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  def withWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")

  /** Gap-based sessionization (30-minute inactivity gap): session ids via
    * lag + running sum — the batch formulation of
    * `flatMapGroupsWithState`-style session state. Partitioned by user: at
    * 100 TB this is one shuffle on user_id and per-user streams sort-merge
    * within partitions. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    // event_id tiebreak keeps session ids deterministic under ts ties
    val order =
      if (events.columns.contains("event_id")) Seq(col("ts"), col("event_id"))
      else Seq(col("ts"))
    val byUser = Window.partitionBy("user_id").orderBy(order: _*)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup usable as a correctness query. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))

  /** Streaming exact dedup with BOUNDED state: duplicates arriving within
    * the watermark horizon are dropped, and per-key state is evicted once
    * the watermark passes — unlike a streaming `dropDuplicates`, whose
    * state grows with every key ever seen (unusable on an unbounded
    * 100 TB/day stream). Batch equivalent (what the oracle checks):
    * `dropDuplicates(keys)` when all duplicates fall inside one horizon.
    * `keys` must NOT include the event-time column — equal-key rows with
    * different timestamps inside the horizon are duplicates by contract. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      horizon: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: each click pairs with the same user's
    * purchases inside `[click.ts, click.ts + withinMinutes]`. The join
    * condition bounds the event-time distance between the sides, so when
    * both inputs carry watermarks Spark evicts buffered rows as the
    * watermark passes — state stays BOUNDED on an unbounded stream, where
    * an unconstrained stream-stream join must buffer both sides forever.
    * The same expression runs identically on batch frames (what the
    * correctness oracle checks); batch planning is a sort-merge join on
    * `user_id` with the time bound as a residual — the streaming
    * counterpart of [[graft.scale.Temporal.rangeJoin]]. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") +
            expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("click_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("purchase_id"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("purchase_value"))
  }

  /** Streaming entry: file-source stream over a parquet directory, windowed
    * aggregation, processed with `Trigger.AvailableNow` (the reference's
    * poll-until-drained model). Used by the streaming spec via the memory
    * sink. */
  def runAvailableNow(spark: SparkSession, dir: String, schema: StructType,
      queryName: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = windowedAgg(withWatermark(stream))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
