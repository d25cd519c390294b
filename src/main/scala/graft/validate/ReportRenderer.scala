package graft.validate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sync.SyncResult

/** S17: report sinks — the reference writes an HTML validation report
  * (Migration_Validation.ps1:420-576), a text sync report (Sync.ps1:720-772)
  * and a JSON workflow summary (MasterWorkflow.ps1:179-181). Report *content*
  * is computed as DataFrames; only the tiny rendered artifact touches the
  * driver. */
object ReportRenderer {

  private def write(spark: SparkSession, path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** HTML validation report (shape of Migration_Validation.ps1:420-576). */
  def htmlValidationReport(spark: SparkSession, path: String, collection: String,
      statusRow: DataFrame): Unit = {
    val r = statusRow.collect().head
    val status = r.getAs[String]("status")
    val pct =
      if (r.getAs[Long]("samples_failed") + r.getAs[Long]("samples_passed") == 0) 100.0
      else math.round(r.getAs[Long]("samples_passed") * 10000.0 /
        (r.getAs[Long]("samples_passed") + r.getAs[Long]("samples_failed"))) / 100.0
    val color = status match {
      case "PASSED" => "#2e7d32"; case "PARTIAL" => "#f9a825"; case _ => "#c62828"
    }
    val html =
      s"""<!DOCTYPE html><html><head><title>Migration Validation — $collection</title></head>
         |<body><h1>Validation report: $collection</h1>
         |<p>Status: <b style="color:$color">$status</b></p>
         |<table border="1">
         |<tr><th>Source count</th><td>${r.getAs[Long]("source_cnt")}</td></tr>
         |<tr><th>Target count</th><td>${r.getAs[Long]("target_cnt")}</td></tr>
         |<tr><th>Count diff</th><td>${r.getAs[Long]("diff")}</td></tr>
         |<tr><th>Samples passed</th><td>${r.getAs[Long]("samples_passed")} ($pct%)</td></tr>
         |<tr><th>Samples failed</th><td>${r.getAs[Long]("samples_failed")}</td></tr>
         |<tr><th>Integrity issues</th><td>${r.getAs[Long]("integrity_issues")}</td></tr>
         |</table></body></html>""".stripMargin
    write(spark, path, html)
  }

  /** Text sync report (shape of Sync.ps1:720-772). */
  def syncReport(spark: SparkSession, path: String, collection: String,
      result: SyncResult): Unit = {
    val txt =
      s"""Incremental sync report — $collection
         |=====================================
         |new:       ${result.newDocs}
         |updated:   ${result.updated}
         |deleted:   ${result.deleted}
         |unchanged: ${result.unchanged}
         |errors:    ${result.errors}
         |processed: ${result.totalProcessed}
         |""".stripMargin
    write(spark, path, txt)
  }

  /** JSON workflow summary (shape of MasterWorkflow.ps1:179-181). */
  def workflowReport(spark: SparkSession, path: String,
      reports: Seq[(String, String, Map[String, Long])]): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val items = reports.map { case (collection, status, counts) =>
      val cs = counts.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ", ", "}")
      s"{${q("collection")}: ${q(collection)}, ${q("status")}: ${q(status)}, ${q("tables")}: $cs}"
    }.mkString("[", ", ", "]")
    write(spark, path, s"""{"collections": $items}""")
  }
}
