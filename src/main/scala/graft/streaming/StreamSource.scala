package graft.streaming

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared parquet-directory stream-source plumbing for the streaming
  * family's AvailableNow drains. */
private[streaming] object StreamSource {

  /** Resolve a drain's stream schema: the caller's explicit schema when
    * given (the deployed scheduled-poll shape — the poll should not
    * depend on the producer having written anything yet), else eager
    * inference from the directory's current files. Returns None when
    * nothing can be inferred — an absent or still-empty source directory
    * — so callers treat a poll that fires before the first producer
    * write as a no-op drain instead of a crash. */
  def schemaFor(spark: SparkSession, sourceDir: String,
      explicit: Option[StructType]): Option[StructType] =
    explicit.orElse(
      try Some(spark.read.parquet(sourceDir).schema)
      catch { case _: AnalysisException => None })
}
