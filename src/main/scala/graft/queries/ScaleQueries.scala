package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-training-data-pipeline query registry: the union of the
  * per-family modules (dedup / ANN+embedding / sketches / streaming /
  * text / sampling / pipeline). Each family file owns its queries AND
  * their DuckDB oracle SQL; this object is the stable aggregation
  * point consumed by [[graft.SparkEntry]]. */
object ScaleQueries {
  type QF = ScaleShared.QF

  private def disjointUnion[V](maps: Seq[Map[String, V]]): Map[String, V] = {
    val union = maps.reduce(_ ++ _)
    // a duplicate name across family modules would silently shadow one
    // implementation with another — fail at first touch instead
    require(union.size == maps.map(_.size).sum,
      "duplicate query name across scale-query family modules")
    union
  }

  val queries: Map[String, QF] = disjointUnion(Seq(
    DedupQueries.queries, AnnQueries.queries, SketchQueries.queries,
    StreamScaleQueries.queries, TextQueries.queries, SamplingQueries.queries, PipelineQueries.queries))

  def oracles: Map[String, String] = disjointUnion(Seq(
    DedupQueries.oracles, AnnQueries.oracles, SketchQueries.oracles,
    StreamScaleQueries.oracles, TextQueries.oracles, SamplingQueries.oracles, PipelineQueries.oracles))

  def ensureIncrCcState(s: SparkSession, dir: String): String =
    ScaleShared.ensureIncrCcState(s, dir)

  def ccLabels(s: SparkSession, dir: String): DataFrame =
    ScaleShared.ccLabels(s, dir)
}
