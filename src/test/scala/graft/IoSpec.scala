package graft

import graft.io.EngineConfig
import graft.sync.SyncResult
import graft.validate.{ReportRenderer, Validator}

/** S19/X3/O9 config source, S17 report sinks, S14/S15 catalog DDL. */
class IoSpec extends SparkSpec {
  import spark.implicits._

  private val goodConfig =
    """{"MongoDB": {"ConnectionString": "mongodb://localhost:27017",
      |  "Database": "testdb", "Collection": "users"},
      | "MySQL": {"Server": "localhost", "Port": 3306, "Database": "target",
      |  "Username": "u", "Password": "p"},
      | "Migration": {"BatchSize": 500}}""".stripMargin

  test("S19: config parses with defaults and explicit values") {
    val cfg = EngineConfig.parse(goodConfig)
    assert(cfg.mongo.collection == "users")
    assert(cfg.mysql.exists(_.port == 3306))
    assert(cfg.batchSize == 500)
    val noBatch = EngineConfig.parse(goodConfig.replace(
      """ "Migration": {"BatchSize": 500}""", """ "Migration": {}"""))
    assert(noBatch.batchSize == 100) // reference default, Data_Migration.ps1:40
  }

  test("O9: missing required config sections are hard errors (Q10 fixed)") {
    intercept[IllegalArgumentException] {
      EngineConfig.parse("""{"MySQL": {"Server": "x", "Database": "d",
        "Username": "u", "Password": "p"}}""")
    }
    intercept[IllegalArgumentException] {
      EngineConfig.parse("""{"MongoDB": {"ConnectionString": "c",
        "Database": "d", "Collection": "x"}}""") // no sink at all
    }
  }

  test("S17: HTML validation report renders status and counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    val df = (1 to 20).map(i => (i.toString, s"n$i")).toDF("_id", "name")
    val status = Validator.statusReport(df, df, "_id", Seq("name"))
    ReportRenderer.htmlValidationReport(spark, s"$dir/v.html", "users", status)
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/v.html")), "UTF-8")
    assert(html.contains("PASSED") && html.contains("users"))
    // the reference report's section structure (Migration_Validation.ps1)
    assert(html.contains("""<div class="status passed">"""))
    assert(html.contains("<h2>Record Count Comparison</h2>"))
    assert(html.contains("<h2>Sample Validation</h2>"))
    assert(html.contains("Source Documents") && html.contains("Target Records"))
    // a clean run renders NO issues section and no detail table
    assert(!html.contains("Issues Found"))
    assert(!html.contains("Detailed Comparison Results"))
  }

  test("S17: failing validation renders issues and the detail table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep3").toString
    val src = (1 to 20).map(i => (i.toString, s"n$i")).toDF("_id", "name")
    // target: two rows drifted, one duplicate key, one missing row
    val tgt = ((1 to 19).map(i =>
        (i.toString, if (i >= 18) s"CHANGED$i" else s"n$i")) :+ ("5", "n5"))
      .toDF("_id", "name")
    val status = Validator.statusReport(src, tgt, "_id", Seq("name"))
    val sample = src.orderBy(org.apache.spark.sql.functions.col("_id").desc)
      .limit(10)
    ReportRenderer.htmlValidationReport(spark, s"$dir/v.html", "users", status,
      integrity = Some(Validator.integrity(tgt, "_id")),
      details = Some(Validator.rowCompare(sample, tgt, "_id", Seq("name"))))
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/v.html")), "UTF-8")
    assert(html.contains("Issues Found"))
    assert(html.contains("duplicate _id values"))
    assert(html.contains("<h2>Detailed Comparison Results</h2>"))
    // drifted doc 19 (in the string-desc top-10 sample) appears as a
    // detail row with its field diff; 18 sorts below the sample window
    assert(html.contains("<td>19</td>") && html.contains("CHANGED19"))
    assert(html.contains("""<div class="status """)) // banner present
  }

  test("S17: sync + workflow reports render") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep2").toString
    ReportRenderer.syncReport(spark, s"$dir/s.txt", "users",
      SyncResult(1, 2, 3, 4, 0))
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/s.txt")), "UTF-8")
    assert(txt.contains("updated:   2") && txt.contains("processed: 6"))
    ReportRenderer.workflowReport(spark, s"$dir/w.json",
      Seq(("users", "PASSED", Map("users" -> 10L))))
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/w.json")), "UTF-8")
    assert(json.contains("\"status\": \"PASSED\""))
  }

  test("S14/S15: catalog DDL — create, describe, drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/t.parquet")
    spark.sql(s"CREATE TABLE graft_tmp USING parquet LOCATION '$dir/t.parquet'")
    try {
      assert(spark.catalog.tableExists("graft_tmp"))
      assert(spark.table("graft_tmp").count() == 1)
      // S9: column metadata via the catalog
      assert(spark.catalog.listColumns("graft_tmp").collect()
        .map(_.name).sorted.toSeq == Seq("k", "v"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_tmp")
    assert(!spark.catalog.tableExists("graft_tmp"))
  }
}
