package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnalyticsQueries, CoreQueries, CoverageQueries, ScaleQueries}
import graft.types.Dialect
import graft.workflow.{MigrationConfig, MigrationWorkflow}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` holds one named entry per implemented SURVEY §2 operator (plus
  * the LLM-pipeline operators); `oracleSql` the DuckDB-equivalent SQL the
  * driver cross-checks each against at sf0.01. */
object SparkEntry {
  /** Flagship: the full migration pipeline (O2) on sf0.001 — profile →
    * relational model + DDL artifact → decompose (main + child tables) →
    * write → validate; returns the per-table row-count report (rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.orderDocs(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft_entry").toString
    val report = MigrationWorkflow.fullMigration(spark, docs,
      MigrationConfig("odocs", out, Dialect.MySQL, fullProfile = true))
    // the report is ONE DataFrame plan (union of count-pruned scans), not
    // a driver-side Map rendered to rows — exchange-auditable (PlanSpec)
    MigrationWorkflow.countReport(spark, out, report.rowCounts.keys.toSeq)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ScaleQueries.queries ++ AnalyticsQueries.queries ++
      CoverageQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ScaleQueries.oracles ++ AnalyticsQueries.oracles ++
      CoverageQueries.oracles
}
