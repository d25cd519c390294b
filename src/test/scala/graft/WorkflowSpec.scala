package graft

import org.apache.spark.sql.functions._
import graft.types.Dialect
import graft.workflow.{MigrationConfig, MigrationWorkflow}

/** O1-O7 orchestration: discovery, full migration, incremental fallback
  * (MasterWorkflow.ps1 semantics). Runs on sf0.001. */
class WorkflowSpec extends SparkSpec {
  import spark.implicits._

  test("S5/F6: collection discovery filters system.* and sorts") {
    val names = MigrationWorkflow.discoverCollections(spark, sfDir)
    assert(names == names.sorted)
    assert(names.contains("orders") && names.contains("lineitem"))
    assert(!names.exists(_.startsWith("system.")))
  }

  test("O2: full migration writes all tables + DDL artifact, validates PASSED") {
    val out = java.nio.file.Files.createTempDirectory("graft_wf").toString
    val docs = Tables.orderDocs(spark, sfDir)
    val report = MigrationWorkflow.fullMigration(spark, docs,
      MigrationConfig("odocs", out, Dialect.MySQL, fullProfile = true))
    assert(report.status == "PASSED")
    assert(report.rowCounts.keySet ==
      Set("odocs", "odocs_customer", "odocs_lineitems", "odocs_tags"))
    assert(report.rowCounts("odocs") == 1500)
    assert(report.rowCounts("odocs_lineitems") == 6000)
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/odocs_schema_mysql.sql")), "UTF-8")
    assert(ddl.contains("CREATE TABLE `odocs`"))
    assert(ddl.contains("FOREIGN KEY (`odocs__id`)"))
  }

  test("O3: incremental falls back to full when target missing, syncs when present") {
    val out = java.nio.file.Files.createTempDirectory("graft_wf2").toString
    val docs = Tables.orderDocs(spark, sfDir)
    val cfg = MigrationConfig("odocs", out, Dialect.MySQL)
    val first = MigrationWorkflow.incrementalMigration(spark, docs, cfg)
    assert(first.isLeft) // fallback to full (MasterWorkflow.ps1:314-318)
    // prime sync state to the current snapshot, then re-run: all unchanged
    val flat = graft.decompose.Decomposer.mainTable(docs,
      graft.model.RelationalModel.compile(
        graft.profile.SchemaProfiler.collectProfile(docs), "odocs").head)
    graft.io.StateStore.save(spark,
      graft.sync.DocHash.withDocHash(flat).select($"_id", $"doc_hash".as("hash")),
      s"$out/sync_state_odocs.parquet")
    val second = MigrationWorkflow.incrementalMigration(spark, docs, cfg)
    assert(second.isRight)
    val r = second.toOption.get
    assert(r.newDocs == 0 && r.deleted == 0)
  }

  test("O4: schemaOnly emits the model without moving data") {
    val out = java.nio.file.Files.createTempDirectory("graft_wf3").toString
    val docs = Tables.orderDocs(spark, sfDir)
    val model = MigrationWorkflow.schemaOnly(spark, docs,
      MigrationConfig("odocs", out, Dialect.SQLServer))
    assert(model.map(_.name).toSet ==
      Set("odocs", "odocs_customer", "odocs_lineitems", "odocs_tags"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/odocs_schema_sqlserver.sql")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/odocs.parquet")))
  }
}
