package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.scale.Sketches

/** Streaming frequency-sketch maintenance: each arriving micro-batch of
  * token occurrences folds into a persisted Count-Min grid
  * ([[Sketches.cms]]) — the running corpus token-frequency monitor (drift
  * alarms, heavy-hitter probes) without ever re-scanning history.
  *
  * CMS counters are LINEAR, which makes the streaming state radically
  * simpler than [[StreamDedup]]/[[StreamIndex]]: no read-modify-write of
  * prior state at all. Each batch owns one `batch=<id>` directory holding
  * only that batch's grid (bounded by groups × depth × width regardless
  * of batch size), and the live sketch is the cell-wise sum over the
  * committed batch grids ([[currentSketch]]) — a read-time aggregation of
  * a bounded frame, exactly the two-level `sk_hll_rollup` shape.
  *
  * Idempotent under foreachBatch's at-least-once contract by the same
  * write shape as the other streaming operators: a replayed batch
  * overwrites its own directory whole (never double-appends) and a COMMIT
  * marker short-circuits replays of fully committed batches.
  * [[currentSketch]] reads ONLY committed batches, so a crash between the
  * grid write and the marker never exposes a half-written grid. */
object StreamSketch {

  case class BatchResult(batchId: Long, received: Long, cells: Long,
      replaySkipped: Boolean)

  private def marker(root: String, batchId: Long) =
    new Path(root, s"batch_$batchId.done")

  /** Fold one micro-batch of (group, token) occurrences into the grid
    * store (the foreachBatch body; directly callable for batch pipelines
    * and tests). Markers live under `stateRoot`, NOT `gridRoot` — the
    * grid root must stay a pure partitioned parquet layout. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      groupCol: String, tokCol: String, gridRoot: String, stateRoot: String,
      depth: Int, width: Int): BatchResult = {
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker(stateRoot, batchId)))
      return BatchResult(batchId, 0, 0, replaySkipped = true)
    val received = batch.count()
    val grid = Sketches.cms(batch, groupCol, tokCol, depth, width)
    grid.write.mode("overwrite").parquet(s"$gridRoot/batch=$batchId")
    val cells = spark.read.parquet(s"$gridRoot/batch=$batchId").count()
    fs.create(marker(stateRoot, batchId), true).close()
    BatchResult(batchId, received, cells, replaySkipped = false)
  }

  /** The live sketch: cell-wise sum over every COMMITTED batch grid.
    * Uncommitted directories (a crash between grid write and marker) are
    * excluded — the replay will overwrite them whole before committing.
    * Fails loudly when nothing has committed yet: an empty sketch answers
    * "0" for every probe, which silently reads as "token never seen". */
  def currentSketch(spark: SparkSession, gridRoot: String,
      stateRoot: String): DataFrame = {
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.globStatus(new Path(stateRoot, "batch_*.done"))
      .map(_.getPath.getName.stripPrefix("batch_").stripSuffix(".done").toLong)
    require(committed.nonEmpty,
      s"no committed batch grids under $gridRoot (markers in $stateRoot)")
    spark.read.parquet(gridRoot)
      .filter(col("batch").isin(committed.toSeq: _*))
      .groupBy("grp", "row_j", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Streaming distinct-count maintenance — the same per-batch-grid +
    * commit-marker shape with Spark's mergeable HLL states as the grid:
    * each batch reduces to one `hll_sketch_agg` binary per group (KB-sized
    * regardless of batch rows), and the live estimate unions the committed
    * batch states ([[currentDistinct]]) — the `sk_hll_rollup` two-level
    * pattern kept fresh by a stream, history never re-scanned. */
  def applyHllBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      groupCol: String, valueCol: String, gridRoot: String,
      stateRoot: String, lgK: Int = 12): BatchResult = {
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker(stateRoot, batchId)))
      return BatchResult(batchId, 0, 0, replaySkipped = true)
    val received = batch.count()
    val grid = batch.groupBy(col(groupCol).as("grp"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))
    grid.write.mode("overwrite").parquet(s"$gridRoot/batch=$batchId")
    val cells = spark.read.parquet(s"$gridRoot/batch=$batchId").count()
    fs.create(marker(stateRoot, batchId), true).close()
    BatchResult(batchId, received, cells, replaySkipped = false)
  }

  /** Live distinct estimate per group: union the committed batch HLL
    * states and estimate — constant-size state per (group, batch), exact
    * mergeability by the sketch algebra. Fails loudly with no committed
    * batches, like [[currentSketch]]. */
  def currentDistinct(spark: SparkSession, gridRoot: String,
      stateRoot: String): DataFrame = {
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = fs.globStatus(new Path(stateRoot, "batch_*.done"))
      .map(_.getPath.getName.stripPrefix("batch_").stripSuffix(".done").toLong)
    require(committed.nonEmpty,
      s"no committed batch grids under $gridRoot (markers in $stateRoot)")
    spark.read.parquet(gridRoot)
      .filter(col("batch").isin(committed.toSeq: _*))
      .groupBy("grp")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"))
  }

  /** Drain a parquet-directory stream through the sketch (AvailableNow —
    * the scheduled-poll form; `tokens` maps a raw batch to (group, token)
    * occurrence rows, e.g. an explode over a tokenizer). */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      tokens: DataFrame => DataFrame, groupCol: String, tokCol: String,
      gridRoot: String, stateRoot: String, checkpoint: String,
      depth: Int, width: Int): Unit = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, tokens(b), id, groupCol, tokCol,
          gridRoot, stateRoot, depth, width): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
