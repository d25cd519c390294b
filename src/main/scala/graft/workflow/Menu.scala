package graft.workflow

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.profile.SchemaProfiler
import graft.types.Dialect

/** O8: the interactive menu (InteractiveMenu.ps1:1-52, switch :27-45) as a
  * minimal stdin REPL over the engine API. Not engine-core (SURVEY §2.12
  * marks it optional); useful for manual smoke-driving. */
object Menu {
  val options: Seq[(String, String)] = Seq(
    "1" -> "Test connections (probe source dir)",
    "2" -> "List collections with counts",
    "3" -> "Full migration (orders docs)",
    "4" -> "Incremental sync",
    "5" -> "Validate",
    "6" -> "Schema only (print profile + DDL)",
    "q" -> "Quit")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_menu").toString
    val spark = graft.io.EngineSession.local(8, "ERROR")
    val in = scala.io.Source.stdin.getLines()
    var done = false
    while (!done) {
      println("\n=== NoSQL→SQL migration engine ===")
      options.foreach { case (k, label) => println(s"  [$k] $label") }
      print("> ")
      val choice = if (in.hasNext) in.next().trim else "q"
      done = !dispatch(spark, sfDir, outDir, choice)
    }
    spark.stop()
  }

  /** Returns false to exit the loop. Exposed for testing. */
  def dispatch(spark: SparkSession, sfDir: String, outDir: String,
      choice: String): Boolean = choice match {
    case "1" =>
      val ok = MigrationWorkflow.discoverCollections(spark, sfDir).nonEmpty
      println(if (ok) s"source OK: $sfDir" else s"source UNREACHABLE: $sfDir"); true
    case "2" =>
      MigrationWorkflow.discoverCollections(spark, sfDir).foreach { c =>
        println(f"$c%-12s ${Tables.load(spark, sfDir, c).count()}%8d docs")
      }; true
    case "3" =>
      val r = MigrationWorkflow.fullMigration(spark,
        Tables.orderDocs(spark, sfDir), MigrationConfig("odocs", outDir))
      println(s"status=${r.status} tables=${r.rowCounts}"); true
    case "4" =>
      MigrationWorkflow.incrementalMigration(spark,
        Tables.orderDocs(spark, sfDir), MigrationConfig("odocs", outDir)) match {
        case Left(r) => println(s"fell back to full: ${r.rowCounts}")
        case Right(r) => println(s"new=${r.newDocs} updated=${r.updated} " +
          s"deleted=${r.deleted} unchanged=${r.unchanged}")
      }; true
    case "5" =>
      val docs = Tables.orderDocs(spark, sfDir)
      MigrationWorkflow.validationOnly(spark, docs,
        MigrationConfig("odocs", outDir),
        Seq("o_custkey", "o_orderstatus")).show(truncate = false); true
    case "6" =>
      val docs = Tables.orderDocs(spark, sfDir)
      val prof = SchemaProfiler.profile(docs, 100)
      println(prof.describe)
      MigrationWorkflow.schemaOnly(spark, docs,
        MigrationConfig("odocs", outDir, Dialect.MySQL))
        .foreach(t => println(t.ddl(Dialect.MySQL) + "\n")); true
    case "q" | "" => false
    case other => println(s"unknown option: $other"); true
  }
}
