package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.StateStore
import graft.scale.Dedup

/** Streaming corpus deduplication: each arriving micro-batch of documents
  * dedups against the persisted corpus state — exact fingerprints AND
  * MinHash near-dup signatures — appends only its survivors to the clean
  * corpus, and publishes the advanced state as immutable versions
  * ([[StateStore.saveVersion]]). History is never re-scanned or re-hashed:
  * per-batch cost is the batch's own chains plus bounded joins against
  * stored state ([[Dedup.exactIncremental]] / [[Dedup.minhashIncremental]]).
  *
  * Effectively-exactly-once under foreachBatch's at-least-once contract:
  *  - the corpus append is a per-batch directory overwrite (replay rewrites
  *    the same files, never double-appends),
  *  - a commit marker written AFTER corpus + state makes a replayed batch a
  *    no-op (the guard, not the state, provides idempotence — a replay
  *    against already-advanced state would otherwise see zero survivors
  *    and overwrite the batch directory with nothing).
  *
  * Drop rule (greedy, C4-style): a batch document drops if it is an exact
  * duplicate of history or of a smaller-id batch row, or a verified
  * near-duplicate (Jaccard ≥ threshold) of history or of a smaller-id batch
  * survivor. History always outranks the batch.
  */
object StreamDedup {

  case class BatchResult(batchId: Long, received: Long, exactDropped: Long,
      nearDropped: Long, appended: Long, replaySkipped: Boolean)

  private def marker(root: String, batchId: Long) =
    new Path(root, s"batch_$batchId.done")

  /** Dedup one micro-batch (the foreachBatch body; directly callable for
    * batch pipelines and tests). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, corpusPath: String, stateRoot: String,
      jaccardThreshold: Double = 0.9, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, keepVersions: Int = 3): BatchResult = {
    val fs = new Path(stateRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker(stateRoot, batchId)))
      return BatchResult(batchId, 0, 0, 0, 0, replaySkipped = true)
    val fpRoot = s"$stateRoot/fp"
    val sigRoot = s"$stateRoot/sig"
    val received = batch.count()

    // exact pass vs fingerprint state (bootstrap: empty state of the right
    // schema on the first batch)
    val fpState =
      if (StateStore.versions(spark, fpRoot).nonEmpty)
        StateStore.loadVersion(spark, fpRoot,
          StateStore.versions(spark, fpRoot).last)
      else Dedup.exactState(batch.limit(0), idCol, textCol)
    val (exactSurvRaw, nextFp) =
      Dedup.exactIncremental(fpState, batch, idCol, textCol)
    // consumed by the sig chain, the drop join, and the corpus write
    val exactSurv = graft.io.Materialize(exactSurvRaw)
    val exactKept = exactSurv.count()

    // near-dup pass vs signature state
    val sigState =
      if (StateStore.versions(spark, sigRoot).nonEmpty)
        StateStore.loadVersion(spark, sigRoot,
          StateStore.versions(spark, sigRoot).last)
      else Dedup.minhashState(batch.limit(0), idCol, textCol, k, shingleN)
    val (pairs, nextSigAll) = Dedup.minhashIncremental(sigState, exactSurv,
      idCol, textCol, k, bands, jaccardThreshold, shingleN)
    val batchIds = exactSurv.select(col(idCol))
    val flagged = pairs
      .join(batchIds.select(col(idCol).as("id_a"), lit(true).as("a_in")),
        Seq("id_a"), "left")
      .join(batchIds.select(col(idCol).as("id_b"), lit(true).as("b_in")),
        Seq("id_b"), "left")
    // both-in-batch: the greater id drops; batch-vs-history: the batch
    // endpoint drops (history outranks the batch regardless of id order)
    val drops = flagged.select(
      when(col("a_in").isNotNull && col("b_in").isNotNull,
        greatest(col("id_a"), col("id_b")))
        .when(col("a_in").isNotNull, col("id_a"))
        .otherwise(col("id_b")).as(idCol)).distinct()
    val kept = exactSurv.join(drops, Seq(idCol), "left_anti")

    // idempotent corpus append: one directory per batch, overwritten whole
    kept.write.mode("overwrite").parquet(s"$corpusPath/batch=$batchId")
    val appended = spark.read.parquet(s"$corpusPath/batch=$batchId").count()

    // publish advanced state (dropped docs' signatures do not enter state —
    // their survivors already represent them)
    StateStore.saveVersion(spark, nextFp, fpRoot, keepVersions)
    StateStore.saveVersion(spark,
      nextSigAll.join(drops.select(col(idCol).as("id")), Seq("id"), "left_anti"),
      sigRoot, keepVersions)
    fs.create(marker(stateRoot, batchId), true).close()
    BatchResult(batchId, received, received - exactKept,
      exactKept - appended, appended, replaySkipped = false)
  }

  /** Drain a parquet-directory stream of document files through the dedup
    * (AvailableNow — the scheduled-poll form). */
  def runAvailableNow(spark: SparkSession, sourceDir: String, idCol: String,
      textCol: String, corpusPath: String, stateRoot: String,
      checkpoint: String, jaccardThreshold: Double = 0.9): Unit = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val q = stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, b, id, idCol, textCol, corpusPath,
          stateRoot, jaccardThreshold): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
