package graft.io

import org.apache.spark.sql.DataFrame

/** Lineage-cutting materialization for frames that are consumed by multiple
  * plan branches or produced by iterative loops (connected components,
  * k-means), where keeping the full logical lineage would grow the analyzed
  * plan multiplicatively per round.
  *
  * Mode selection:
  *  - RELIABLE checkpoint when `sparkContext.setCheckpointDir(...)` has been
  *    configured: blocks live on the checkpoint filesystem, so losing an
  *    executor (crash, or dynamic allocation reclaiming it) cannot strand
  *    the materialized frame — the right mode on a multi-executor cluster.
  *  - Executor-local checkpoint otherwise: no filesystem round-trip, blocks
  *    on executor storage. Appropriate for single-JVM/local runs where an
  *    executor loss kills the job anyway; its storage is reclaimed by the
  *    context cleaner once the frame is garbage-collected.
  *
  * Eagerness is gated by `spark.graft.eagerMaterialize` (default false):
  * building a query must never run Spark jobs as a construction-time side
  * effect (plan inspection stays free). Loops that need the frame
  * materialized immediately follow the call with an action of their own, so
  * lazy checkpointing costs them nothing.
  */
object Materialize {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val eager = spark.conf.getOption("spark.graft.eagerMaterialize")
      .exists(_.toBoolean)
    if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }

  /** Drop a materialized frame's executor-local blocks once every consumer
    * has run its action. Iterative loops produce one dead frame per round;
    * without an explicit release their blocks survive until the GC-driven
    * ContextCleaner notices, and the accumulated storage competes with the
    * live working set. Releasing a frame something unmaterialized still
    * depends on is NOT safe (local checkpoints sever lineage — the blocks
    * are the only copy). */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.unpersistRdds(df)
}
