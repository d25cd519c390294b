package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.StateStore
import graft.scale.Pq

/** Streaming ANN-index maintenance: each arriving micro-batch of vectors
  * is PQ-encoded against a frozen codebook and appended to the compressed
  * code table — the index stays fresh without ever re-encoding history
  * (the 100 TB contract: per-batch cost is the batch's own scan).
  *
  * The codebook is trained ONCE, on the first batch, and published as a
  * versioned state ([[StateStore.saveVersion]]); every later batch loads
  * the latest version and only encodes. Alongside the codes, each batch's
  * per-subspace quantization-error sufficient statistics
  * ([[Pq.quantizationError]] — int64 nano SSE + count) are appended to an
  * error log: a rising err/n across batches is the retrain trigger, read
  * WITHOUT touching the code table.
  *
  * Idempotent under foreachBatch's at-least-once contract, by the same
  * write-shape as [[StreamDedup]]: each batch owns one `batch=<id>`
  * directory (overwritten whole on replay — never double-appended) and a
  * COMMIT marker short-circuits replays of fully committed batches. The
  * codebook state is replay-safe by construction: training is
  * deterministic (min-id seeds, no RNG), so a replayed bootstrap batch
  * republishes byte-identical centroids. */
object StreamIndex {

  case class BatchResult(batchId: Long, received: Long, encoded: Long,
      bootstrapped: Boolean, replaySkipped: Boolean)

  private def marker(root: String, batchId: Long) =
    new Path(root, s"batch_$batchId.done")

  /** Encode one micro-batch (the foreachBatch body; directly callable for
    * batch pipelines and tests). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, codesPath: String, stateRoot: String,
      m: Int = 4, k: Int = 4, iters: Int = 2,
      keepVersions: Int = 3): BatchResult = {
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker(stateRoot, batchId)))
      return BatchResult(batchId, 0, 0, bootstrapped = false,
        replaySkipped = true)
    val cbRoot = s"$stateRoot/codebook"
    val received = batch.count()

    // frozen codebook: latest published version, or train-and-publish on
    // the bootstrap batch (deterministic, so a replay republishes the
    // identical frame and the overwrite is byte-stable)
    val (cb, bootstrapped) = StateStore.versions(spark, cbRoot).lastOption match {
      case Some(v) => (StateStore.loadVersion(spark, cbRoot, v), false)
      case None =>
        val trained = Pq.codebook(batch, idCol, vecCol, m, k, iters)
        StateStore.saveVersion(spark, trained, cbRoot, keepVersions)
        (StateStore.loadVersion(spark, cbRoot,
          StateStore.versions(spark, cbRoot).last), true)
    }
    val cbCached = cb.cache()

    // idempotent appends: one directory per batch, overwritten whole
    Pq.encode(batch, cbCached, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$codesPath/batch=$batchId")
    Pq.quantizationError(batch, cbCached, idCol, vecCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(s"$stateRoot/err/batch=$batchId")
    val encoded = spark.read.parquet(s"$codesPath/batch=$batchId").count()

    fs.create(marker(stateRoot, batchId), true).close()
    cbCached.unpersist()
    BatchResult(batchId, received, encoded, bootstrapped,
      replaySkipped = false)
  }

  /** Drain a parquet-directory stream of vectors through the index
    * (AvailableNow — the scheduled-poll form). */
  def runAvailableNow(spark: SparkSession, sourceDir: String, idCol: String,
      vecCol: String, codesPath: String, stateRoot: String,
      checkpoint: String): Unit = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, b, id, idCol, vecCol, codesPath,
          stateRoot): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
