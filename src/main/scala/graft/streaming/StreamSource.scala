package graft.streaming

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared parquet-directory stream-source plumbing for the streaming
  * family's AvailableNow drains. */
private[streaming] object StreamSource {

  private lazy val log =
    org.apache.logging.log4j.LogManager.getLogger("graft.stream")

  /** Resolve a drain's stream schema: the caller's explicit schema when
    * given (the deployed scheduled-poll shape — the poll should not
    * depend on the producer having written anything yet), else eager
    * inference from the directory's current files. Returns None when
    * nothing can be inferred — an absent or still-empty source directory
    * — so callers treat a poll that fires before the first producer
    * write as a no-op drain instead of a crash.
    *
    * The no-op is WARNED, naming which of the two states the directory is
    * in: a typo'd/misconfigured `sourceDir` in a deployed scheduled poll
    * is otherwise indistinguishable from "producer hasn't written yet",
    * and the poll would silently no-op forever. */
  def schemaFor(spark: SparkSession, sourceDir: String,
      explicit: Option[StructType]): Option[StructType] =
    explicit.orElse(
      try Some(spark.read.parquet(sourceDir).schema)
      catch {
        case _: AnalysisException =>
          val p = new org.apache.hadoop.fs.Path(sourceDir)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val state =
            if (!fs.exists(p))
              "directory does not exist — check the configured path"
            else "directory exists but holds no readable parquet yet"
          log.warn(s"schema inference failed for stream source " +
            s"'$sourceDir' ($state); draining as a no-op this poll")
          None
      })
}
