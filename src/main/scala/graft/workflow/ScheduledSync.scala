package graft.workflow

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.decompose.Decomposer
import graft.model.RelationalModel
import graft.profile.SchemaProfiler
import graft.sync.IncrementalSync
import graft.validate.ReportRenderer

/** O6: scheduled-sync entry point (Invoke-ScheduledSync, Sync.ps1:774-809) —
  * one sync pass + a text report artifact. The reference's "scheduler" is a
  * manual wrapper; the real cadence comes from an external scheduler (or
  * Structured Streaming's Trigger.AvailableNow, see
  * [[graft.streaming.EventStream]]). Usage:
  * `runMain graft.workflow.ScheduledSync <sfDir> <outDir> [collection]`. */
object ScheduledSync {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_sched").toString
    val collection = if (args.length > 2) args(2) else "odocs"
    val spark = graft.io.EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "WARN")
    val docs = Tables.orderDocs(spark, sfDir)
    val result = MigrationWorkflow.incrementalMigration(spark, docs,
      MigrationConfig(collection, outDir)) match {
      case Left(report) =>
        println(s"[scheduled-sync] target missing — ran full migration: " +
          s"${report.rowCounts}")
        graft.sync.SyncResult(report.rowCounts.getOrElse(collection, 0L), 0, 0, 0, 0)
      case Right(r) => r
    }
    ReportRenderer.syncReport(spark, s"$outDir/sync_report_$collection.txt",
      collection, result)
    val kids = result.children.toSeq.sortBy(_._1).map { case (c, k) =>
      s" $c(+${k.inserted}/-${k.deleted})" }.mkString
    println(s"[scheduled-sync] new=${result.newDocs} updated=${result.updated} " +
      s"deleted=${result.deleted} unchanged=${result.unchanged}$kids")
    spark.stop()
  }
}
