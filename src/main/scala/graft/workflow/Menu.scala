package graft.workflow

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.profile.SchemaProfiler
import graft.types.Dialect

/** O8: the interactive menu (InteractiveMenu.ps1:1-52, switch :27-45) as a
  * minimal stdin REPL over the engine API — option-for-option parity with
  * the reference's nine entries + quit. Not engine-core (SURVEY §2.12
  * marks it optional); useful for manual smoke-driving. */
object Menu {
  val options: Seq[(String, String)] = Seq(
    "1" -> "Test connections (probe source dir)",
    "2" -> "Discover collections with counts",
    "3" -> "Migrate single collection (default odocs)",
    "4" -> "Migrate multiple collections (comma list)",
    "5" -> "Migrate ALL discovered collections",
    "6" -> "Sync single collection (incremental, full fallback)",
    "7" -> "Sync ALL discovered collections",
    "8" -> "Validate single collection",
    "9" -> "Schema only (print profile + DDL)",
    "0" -> "Quit")

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
      val choice = if (in.hasNext) in.next().trim else "0"
      done = !dispatch(spark, sfDir, outDir, choice)
    }
    spark.stop()
  }

  /** The nested order documents for "odocs"; any other name loads the
    * flat parquet collection as documents, adopting the leading column as
    * `_id` when none exists (the mongo-document contract the migration
    * pipeline keys on — flat fixture tables lead with their key). */
  private def docsFor(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    if (name == "odocs") Tables.orderDocs(spark, sfDir)
    else {
      val df = Tables.load(spark, sfDir, name)
      if (df.columns.contains("_id")) df
      else df.withColumn("_id",
        org.apache.spark.sql.functions.col(df.columns.head))
    }
  }

  private def migrate(spark: SparkSession, sfDir: String, outDir: String,
      names: Seq[String]): Unit =
    MigrationWorkflow.run(spark, sfDir, names,
      cfgFor = n => MigrationConfig(n, outDir),
      loadDocs = n => docsFor(spark, sfDir, n))
      .foreach(r => println(s"status=${r.status} tables=${r.rowCounts}"))

  /** Sync requires a UNIQUE `_id`: IncrementalSync keys state/classify/
    * upsert/delete on it, so a duplicate-keyed collection (e.g. lineitem,
    * whose adopted leading l_orderkey repeats per line) would
    * cross-multiply the classify join and drop or duplicate rows on
    * apply. Non-unique collections are skipped LOUDLY here instead
    * (migration is unaffected — its main-table write is a full
    * overwrite, not id-keyed). Returns true when the sync ran. */
  private[graft] def syncOne(spark: SparkSession, sfDir: String,
      outDir: String, n: String): Boolean = {
    val docs = docsFor(spark, sfDir, n)
    val dups = docs.groupBy("_id")
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .limit(1).count() // early-out: one witness row decides
    if (dups > 0) {
      println(s"$n: SKIPPED — adopted _id is not unique; incremental " +
        "sync would corrupt an id-keyed merge (pick a collection with " +
        "a unique key, or migrate instead)")
      false
    } else {
      MigrationWorkflow.incrementalMigration(spark, docs,
          MigrationConfig(n, outDir)) match {
        case Left(r) => println(s"$n: fell back to full: ${r.rowCounts}")
        case Right(r) =>
          // per-table tallies, like the reference's migration summary
          // (Data_Migration.ps1:163-186)
          val kids = r.children.toSeq.sortBy(_._1).map { case (c, k) =>
            s" $c(+${k.inserted}/-${k.deleted})" }.mkString
          println(s"$n: new=${r.newDocs} " +
            s"updated=${r.updated} deleted=${r.deleted} " +
            s"unchanged=${r.unchanged}$kids")
      }
      true
    }
  }

  private def sync(spark: SparkSession, sfDir: String, outDir: String,
      names: Seq[String]): Unit =
    names.foreach(n => syncOne(spark, sfDir, outDir, n): Unit)

  /** Returns false to exit the loop. `choice` may carry an argument after
    * a space (e.g. "3 odocs", "4 odocs,nation"). Exposed for testing. */
  def dispatch(spark: SparkSession, sfDir: String, outDir: String,
      choice: String): Boolean = {
    val parts = choice.trim.split("\\s+", 2)
    val (key, arg) = (parts(0), parts.lift(1).map(_.trim).filter(_.nonEmpty))
    key match {
      case "1" =>
        val ok = MigrationWorkflow.discoverCollections(spark, sfDir).nonEmpty
        println(if (ok) s"source OK: $sfDir"
          else s"source UNREACHABLE: $sfDir"); true
      case "2" =>
        MigrationWorkflow.discoverCollections(spark, sfDir).foreach { c =>
          println(f"$c%-12s ${Tables.load(spark, sfDir, c).count()}%8d docs")
        }; true
      case "3" =>
        migrate(spark, sfDir, outDir, Seq(arg.getOrElse("odocs"))); true
      case "4" =>
        val names = arg.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq("odocs"))
        migrate(spark, sfDir, outDir, names); true
      case "5" =>
        migrate(spark, sfDir, outDir,
          MigrationWorkflow.discoverCollections(spark, sfDir)); true
      case "6" =>
        sync(spark, sfDir, outDir, Seq(arg.getOrElse("odocs"))); true
      case "7" =>
        sync(spark, sfDir, outDir,
          MigrationWorkflow.discoverCollections(spark, sfDir)); true
      case "8" =>
        val n = arg.getOrElse("odocs")
        val cols =
          if (n == "odocs") Seq("o_custkey", "o_orderstatus") else Seq.empty
        MigrationWorkflow.validationOnly(spark, docsFor(spark, sfDir, n),
          MigrationConfig(n, outDir), cols).show(truncate = false); true
      case "9" =>
        val docs = docsFor(spark, sfDir, arg.getOrElse("odocs"))
        val prof = SchemaProfiler.profile(docs, 100)
        println(prof.describe)
        MigrationWorkflow.schemaOnly(spark, docs,
          MigrationConfig(arg.getOrElse("odocs"), outDir, Dialect.MySQL))
          .foreach(t => println(t.ddl(Dialect.MySQL) + "\n")); true
      case "0" | "q" | "" => false
      case other => println(s"unknown option: $other"); true
    }
  }
}
