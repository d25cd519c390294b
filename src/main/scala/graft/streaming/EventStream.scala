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

  /** Rolling active users: per observed day, the exact distinct-user count
    * for that day (DAU) and over the trailing `windowDays` (WAU/MAU shape).
    * The raw event volume reduces to distinct user-days FIRST; each
    * user-day then contributes to the `windowDays` calendar days it is
    * visible to via a bounded `sequence` explode — a windowDays-fold blowup
    * of the (≪ events) user-day table, never a range self-join and never a
    * sliding count-distinct window (which Spark cannot partition). Only
    * days actually present in the data are reported. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive: $windowDays")
    val ud = events.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val days = ud.select("day").distinct()
    val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = ud
      .select(explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"), col("user_id"))
      .join(days, Seq("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
  }

  /** Daily-volume anomaly flags per event type — the pipeline-health monitor
    * every ingestion stream needs (a tracking bug or bot flood shows up as a
    * day whose count sits far outside its trailing baseline). Each
    * (event_type, day) count is compared against the trailing `window`
    * OBSERVED days' (a ROWS frame — calendar gaps don't thin the baseline)
    * mean and variance; a day is anomalous when |count − mean| > 3σ and at
    * least `minPrior` baseline days exist.
    *
    * The 3σ test is evaluated in EXACT integer arithmetic — with baseline
    * n, Σ, Q = Σc², the test (c − Σ/n)² > 9·(nQ − Σ²)/n² clears
    * denominators to (nc − Σ)² > 9(nQ − Σ²) — so the flag is bit-stable
    * across engines (no float mean/stddev at the decision boundary). Longs
    * hold it through ~10⁸ events/day/type; beyond that, widen to decimal.
    *
    * 100 TB shape: the raw event volume is touched exactly once by the
    * (type, day) count — everything after runs on ~|types|·|days| rows, and
    * the trailing window partitions by event_type (many small independent
    * windows, never a global sort). */
  def anomalousDays(events: DataFrame, window: Int = 7,
      minPrior: Int = 3): DataFrame =
    anomaliesFromDaily(dailyCounts(events), window, minPrior)

  /** The (event_type, day, n_events) reduction [[anomalousDays]] monitors —
    * the MERGEABLE sufficient statistic: counts are additive, so per-batch
    * frames fold via [[mergeDailyCounts]] (a batch split mid-day sums back
    * to the whole day) and the monitor never replays old events. */
  def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))

  /** Fold a batch's [[dailyCounts]] into accumulated state: one keyed sum.
    * `anomaliesFromDaily(merge(states)) == anomalousDays(all events)`
    * exactly, for ANY batch split. */
  def mergeDailyCounts(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy("event_type", "day")
      .agg(sum(col("n_events")).as("n_events"))

  /** The flagging half of [[anomalousDays]], run on a (type, day, count)
    * frame — state-sized, not event-sized. */
  def anomaliesFromDaily(daily: DataFrame, window: Int = 7,
      minPrior: Int = 3): DataFrame = {
    require(window > 0 && minPrior > 0 && minPrior <= window,
      s"need 0 < minPrior <= window: $minPrior/$window")
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-window, -1)
    val n = count(lit(1)).over(w)
    val s = sum(col("n_events")).over(w)
    val q = sum(col("n_events") * col("n_events")).over(w)
    val dev = n * col("n_events") - s
    daily
      .withColumn("base_days", n)
      .withColumn("is_anomaly",
        when(n >= minPrior && dev * dev > lit(9L) * (n * q - s * s), 1L)
          .otherwise(0L))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("base_days"), col("is_anomaly"))
  }

  /** Top session paths: the first `maxLen` event types of each
    * gap-sessionized session, joined with '>', ranked by frequency (ties
    * broken by path — a total order, so the top-k is engine-stable).
    * Events are cut to the first `maxLen` per session BEFORE collecting,
    * so a pathological bot session never materializes as one giant array;
    * per-group state is bounded by `maxLen`. */
  def topSessionPaths(events: DataFrame, k: Int = 20, maxLen: Int = 5,
      gapMinutes: Int = 30): DataFrame = {
    require(k > 0 && maxLen > 0, s"k/maxLen must be positive: $k/$maxLen")
    val inSession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    sessionize(events, gapMinutes)
      .withColumn("rn", row_number().over(inSession))
      .filter(col("rn") <= maxLen)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(array_join(
        transform(col("evs"), e => e.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** Ordered k-step funnel: how many users complete each prefix of `steps`
    * IN ORDER (each step strictly after the previous one). Per step the
    * events are filtered to that type FIRST, then the user's earliest
    * occurrence after their previous-step time is kept — k user-keyed
    * aggregations over per-type slices (≪ the event log each), never a
    * per-user event sort or collect. Event order is the total
    * (ts, event_id) order, so simultaneous timestamps cannot make the
    * funnel ambiguous. Returns (step_index, step, n_users). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    def stepCount(i: Int, st: String, reached: DataFrame): DataFrame =
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i).cast("long").as("step_index"),
          lit(st).as("step"), col("n_users"))
    var cur = events.filter(col("event_type") === steps.head)
      .groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"))).as("t"))
    var out = Seq(stepCount(1, steps.head, cur))
    steps.tail.zipWithIndex.foreach { case (st, i) =>
      cur = events.filter(col("event_type") === st)
        .select(col("user_id"), struct(col("ts"), col("event_id")).as("e"))
        .join(cur, Seq("user_id"))
        .filter(col("e") > col("t"))
        .groupBy("user_id").agg(min(col("e")).as("t"))
      out = out :+ stepCount(i + 2, st, cur)
    }
    out.reduce(_.unionAll(_)).orderBy("step_index")
  }

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
