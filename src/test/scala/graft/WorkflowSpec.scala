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

  test("O3 at scale: syncBuckets=Some(n) routes the PUBLIC incremental " +
      "API through the changed-bucket path — the bootstrap table adopts " +
      "the __bucket layout in place, then a one-doc churn rewrites " +
      "exactly one bucket") {
    val out = java.nio.file.Files.createTempDirectory("graft_wf4").toString
    val cfg = MigrationConfig("odocs", out, syncBuckets = Some(8))
    val docs = (1L to 64L).map(i => (s"d$i", s"v$i")).toDF("_id", "payload")
    val first = MigrationWorkflow.incrementalMigration(spark, docs, cfg)
    assert(first.isLeft) // bootstrap: full migration writes a PLAIN table
    val target = s"$out/odocs.parquet"
    val root = new java.io.File(target)
    assert(root.listFiles().exists(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
    // first bucketed sync: adopts the plain table in place (no state yet,
    // so everything classifies new; the layout conversion is the point)
    val second = MigrationWorkflow.incrementalMigration(spark, docs, cfg)
    assert(second.isRight)
    def snap() = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map { d =>
        d.getName -> d.listFiles().filterNot(_.getName.startsWith("."))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
    val converted = snap()
    assert(converted.nonEmpty, "conversion produced no bucket dirs")
    assert(!root.listFiles().exists(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")),
      "legacy plain-table files left beside the bucketed layout")
    def readBack() = spark.read.parquet(target).select("_id", "payload")
      .as[(String, String)].collect().toSet
    assert(readBack() == docs.as[(String, String)].collect().toSet)
    // steady state: no churn → nothing rewritten
    val third = MigrationWorkflow.incrementalMigration(spark, docs, cfg)
    assert(third.toOption.get.totalProcessed == 0 && snap() == converted)
    // one-doc churn through the PUBLIC API: exactly one bucket rewrites
    val v2 = (1L to 64L).map(i =>
      (s"d$i", if (i == 7L) "CHANGED" else s"v$i")).toDF("_id", "payload")
    val fourth = MigrationWorkflow.incrementalMigration(spark, v2, cfg)
    assert(fourth.toOption.get.updated == 1)
    val after = snap()
    val rewritten = converted.keySet.filter(d => after(d) != converted(d))
    assert(rewritten.size == 1, s"expected one rewritten bucket: $rewritten")
    assert(readBack() == v2.as[(String, String)].collect().toSet)
  }

  test("O1 concurrency: collections migrate on a bounded pool into one " +
      "shared outDir without racing — reports in input order, artifacts " +
      "keyed by collection, duplicates rejected loud") {
    val out = java.nio.file.Files.createTempDirectory("graft_wfc").toString
    // four differently-sized collections sharing ONE outDir: every
    // artifact path is collection-keyed, so the concurrent runs commute
    val names = Seq("alpha", "beta", "gamma", "delta")
    val sizes = Map("alpha" -> 40L, "beta" -> 10L, "gamma" -> 25L,
      "delta" -> 5L)
    def docsFor(n: String) = (1L to sizes(n))
      .map(i => (s"${n}_$i", s"payload_$i", Seq(i, i + 1)))
      .toDF("_id", "name", "vals")
    val reports = MigrationWorkflow.run(spark, out /* unused: explicit */,
      collections = names,
      cfgFor = n => MigrationConfig(n, out),
      loadDocs = docsFor)
    // input order preserved despite concurrent completion order
    assert(reports.map(_.collection) == names)
    names.foreach { n =>
      val r = reports(names.indexOf(n))
      assert(r.status == "PASSED", s"$n: $r")
      assert(r.rowCounts(n) == sizes(n), s"$n row count")
      // per-collection artifacts landed, keyed by name
      assert(spark.read.parquet(s"$out/$n.parquet").count() == sizes(n))
      assert(spark.read.parquet(s"$out/${n}_vals.parquet").count() ==
        2 * sizes(n))
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$out/${n}_schema_mysql.sql")), n)
      // no cross-contamination: every _id carries its own collection prefix
      assert(spark.read.parquet(s"$out/$n.parquet")
        .filter(!col("_id").startsWith(s"${n}_")).count() == 0, n)
    }
    // duplicate collection names would race on their artifact paths
    val e = intercept[IllegalArgumentException](MigrationWorkflow.run(
      spark, out, Seq("alpha", "alpha"),
      n => MigrationConfig(n, out), docsFor))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
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
