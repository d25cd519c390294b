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

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The reference report's stylesheet structure (Migration_Validation.ps1:
    * 440-463): container card, status banner classes, inline metric blocks,
    * issue/warning callouts, detail table, footer. */
  private val Css =
    """body { font-family: Arial, sans-serif; margin: 20px; background: #f5f5f5; }
      |.container { max-width: 1200px; margin: 0 auto; background: white; padding: 30px; border-radius: 8px; box-shadow: 0 2px 4px rgba(0,0,0,0.1); }
      |h1 { color: #2c3e50; border-bottom: 3px solid #3498db; padding-bottom: 10px; }
      |h2 { color: #34495e; margin-top: 30px; }
      |.status { font-size: 24px; font-weight: bold; padding: 15px; border-radius: 5px; margin: 20px 0; }
      |.status.passed { background: #d4edda; color: #155724; }
      |.status.partial { background: #fff3cd; color: #856404; }
      |.status.failed { background: #f8d7da; color: #721c24; }
      |.metric { display: inline-block; margin: 15px 30px 15px 0; }
      |.metric-label { color: #7f8c8d; font-size: 14px; }
      |.metric-value { font-size: 32px; font-weight: bold; color: #2c3e50; }
      |.issue { background: #f8d7da; border-left: 4px solid #dc3545; padding: 10px; margin: 10px 0; }
      |.success { color: #28a745; }
      |.error { color: #dc3545; }
      |table { width: 100%; border-collapse: collapse; margin: 20px 0; }
      |th, td { padding: 12px; text-align: left; border-bottom: 1px solid #ddd; }
      |th { background: #3498db; color: white; }
      |.footer { margin-top: 30px; padding-top: 20px; border-top: 1px solid #ddd; color: #7f8c8d; font-size: 12px; }""".stripMargin

  /** HTML validation report in the reference's section structure
    * (Migration_Validation.ps1:420-576): status banner → Record Count
    * Comparison metrics → Sample Validation metrics → Issues Found →
    * Detailed Comparison Results → footer.
    *
    * Driver-side data is bounded: `statusRow` is the 1-row V4 rollup,
    * `integrity` the 3-row V3 suite, and `details` (V2 mismatch rows) is
    * capped at [[DetailCap]] — the report is a rendering of already-
    * aggregated results, never a data-plane collect. */
  def htmlValidationReport(spark: SparkSession, path: String, collection: String,
      statusRow: DataFrame, integrity: Option[DataFrame] = None,
      details: Option[DataFrame] = None): Unit = {
    val r = statusRow.collect().head
    val status = r.getAs[String]("status")
    val passed = r.getAs[Long]("samples_passed")
    val failed = r.getAs[Long]("samples_failed")
    val validated = passed + failed
    val when = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .format(java.time.LocalDateTime.now())
    def metric(label: String, value: String, cls: String = "") =
      s"""<div class="metric"><div class="metric-label">${esc(label)}</div>
         |<div class="metric-value $cls">$value</div></div>""".stripMargin
    // per-check issue lines in the reference's Test-DataIntegrity phrasing
    // (Migration_Validation.ps1:382-411); fall back to the rollup count
    val issueLines: Seq[String] = integrity match {
      case Some(df) => df.collect().toSeq.collect {
        case row if row.getAs[Long]("issue_count") > 0 =>
          row.getAs[String]("check_name") match {
            case "null_pk" =>
              s"Found ${row.getAs[Long]("issue_count")} NULL _id values"
            case "duplicate_keys" =>
              s"Found ${row.getAs[Long]("issue_count")} duplicate _id values"
            case "empty_table" => "Table is empty - migration may have failed"
            case other => s"$other: ${row.getAs[Long]("issue_count")}"
          }
      }
      case None if r.getAs[Long]("integrity_issues") > 0 =>
        Seq(s"Found ${r.getAs[Long]("integrity_issues")} integrity issues")
      case None => Seq.empty
    }
    val issuesHtml =
      if (issueLines.isEmpty) ""
      else s"""<h2>Issues Found (${issueLines.size})</h2>\n""" +
        issueLines.map(i => s"""<div class="issue">${esc(i)}</div>""").mkString("\n")
    // detail rows: one line per (_id, field, source_value, target_value)
    // mismatch, grouped per document like the reference's Details table
    val detailsHtml = details.map { df =>
      val rows = df.limit(DetailCap + 1).collect()
      val truncated = rows.length > DetailCap
      val byDoc = rows.take(DetailCap).groupBy(_.getAs[String]("_id")).toSeq
        .sortBy(_._1)
      val trs = byDoc.map { case (id, ds) =>
        val diffs = ds.map { d =>
          s"${esc(d.getAs[String]("field"))}: " +
            s"'${esc(String.valueOf(d.getAs[String]("source_value")))}' vs " +
            s"'${esc(String.valueOf(d.getAs[String]("target_value")))}'"
        }.mkString("<br>")
        s"""<tr><td>${esc(id)}</td><td class="error">✗ Fail</td>
           |<td>${ds.length}</td><td>$diffs</td></tr>""".stripMargin
      }.mkString("\n")
      val note = if (truncated)
        s"""<p class="metric-label">(showing first $DetailCap differences)</p>"""
      else ""
      s"""<h2>Detailed Comparison Results</h2>
         |<table>
         |<tr><th>Document ID</th><th>Status</th><th>Fields Compared</th><th>Differences</th></tr>
         |$trs
         |</table>$note""".stripMargin
    }.getOrElse("")
    val countCls = if (r.getAs[Boolean]("counts_match")) "success" else "error"
    val countMark = if (r.getAs[Boolean]("counts_match")) "✓" else "✗"
    val html =
      s"""<!DOCTYPE html>
         |<html>
         |<head>
         |<title>Migration Validation Report - ${esc(collection)}</title>
         |<style>
         |$Css
         |</style>
         |</head>
         |<body>
         |<div class="container">
         |<h1>Migration Validation Report</h1>
         |<p><strong>Table:</strong> ${esc(collection)}</p>
         |<p><strong>Validation Time:</strong> $when</p>
         |<div class="status ${status.toLowerCase}">Overall Status: $status</div>
         |<h2>Record Count Comparison</h2>
         |<div>
         |${metric("Source Documents", r.getAs[Long]("source_cnt").toString)}
         |${metric("Target Records", r.getAs[Long]("target_cnt").toString)}
         |${metric("Match", countMark, countCls)}
         |</div>
         |<h2>Sample Validation</h2>
         |<div>
         |${metric("Samples Validated", validated.toString)}
         |${metric("Passed", passed.toString, "success")}
         |${metric("Failed", failed.toString, "error")}
         |</div>
         |$issuesHtml
         |$detailsHtml
         |<div class="footer">Generated by the graft migration engine</div>
         |</div>
         |</body>
         |</html>""".stripMargin
    write(spark, path, html)
  }

  /** Detail-table row cap: keeps the report render driver-bounded even if a
    * caller passes an unexpectedly large mismatch frame. */
  val DetailCap = 200

  /** Text sync report (shape of Sync.ps1:720-772). */
  def syncReport(spark: SparkSession, path: String, collection: String,
      result: SyncResult): Unit = {
    // per-child tallies (reference reports per-table insert counts,
    // Data_Migration.ps1:163-186) — a child-heavy churn is visible in the
    // artifact, not just the main-table classify counts
    val childLines = result.children.toSeq.sortBy(_._1)
      .map { case (name, c) =>
        s"child $name: inserted=${c.inserted} deleted=${c.deleted}"
      }
    val childBlock =
      if (childLines.isEmpty) "" else childLines.mkString("", "\n", "\n")
    val txt =
      s"""Incremental sync report — $collection
         |=====================================
         |new:       ${result.newDocs}
         |updated:   ${result.updated}
         |deleted:   ${result.deleted}
         |unchanged: ${result.unchanged}
         |errors:    ${result.errors}
         |processed: ${result.totalProcessed}
         |""".stripMargin + childBlock
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
