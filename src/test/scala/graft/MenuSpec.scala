package graft

import graft.workflow.Menu

/** O8: menu dispatch — option-for-option parity with the reference's
  * nine entries; each drives the engine API; 0/q exit. */
class MenuSpec extends SparkSpec {

  test("menu options dispatch and report; 0/q exit; unknown tolerated") {
    val out = java.nio.file.Files.createTempDirectory("graft_menu").toString
    assert(Menu.dispatch(spark, sfDir, out, "1"))
    assert(Menu.dispatch(spark, sfDir, out, "2"))
    assert(Menu.dispatch(spark, sfDir, out, "3")) // migrate single (odocs)
    assert(Menu.dispatch(spark, sfDir, out, "4 odocs,nation")) // multiple
    assert(Menu.dispatch(spark, sfDir, out, "6")) // sync (target now exists)
    assert(Menu.dispatch(spark, sfDir, out, "8")) // validate
    assert(Menu.dispatch(spark, sfDir, out, "9")) // schema only
    assert(Menu.dispatch(spark, sfDir, out, "zz"))
    assert(!Menu.dispatch(spark, sfDir, out, "q"))
    assert(!Menu.dispatch(spark, sfDir, out, "0"))
    // the migrations dispatched above actually wrote tables
    assert(spark.read.parquet(s"$out/odocs.parquet").count() == 1500)
    assert(spark.read.parquet(s"$out/nation.parquet").count() == 25)
  }

  test("migrate-ALL and sync-ALL walk every discovered collection") {
    val out = java.nio.file.Files.createTempDirectory("graft_menu_all")
      .toString
    assert(Menu.dispatch(spark, sfDir, out, "5"))
    val cols = graft.workflow.MigrationWorkflow
      .discoverCollections(spark, sfDir)
    cols.foreach { c =>
      assert(new java.io.File(s"$out/$c.parquet").exists(), c)
    }
    assert(Menu.dispatch(spark, sfDir, out, "7")) // sync over existing
    // sync-ALL must leave every target at its source row count: unique-
    // keyed collections synced (all-unchanged), duplicate-keyed ones
    // (lineitem's adopted l_orderkey repeats per line) SKIPPED rather
    // than corrupted by an id-keyed merge (round-11 ADVICE: the classify
    // join would cross-multiply and the upsert/delete drop or dup rows)
    cols.foreach { c =>
      val src = graft.Tables.load(spark, sfDir, c).count()
      val tgt = spark.read.parquet(s"$out/$c.parquet").count()
      assert(tgt == src, s"$c: post-sync-ALL rows $tgt != source $src")
    }
  }

  test("sync guard: duplicate-keyed collections are skipped, unique-keyed " +
      "ones sync") {
    val out = java.nio.file.Files.createTempDirectory("graft_menu_guard")
      .toString
    assert(Menu.dispatch(spark, sfDir, out, "3 lineitem")) // migrate is fine
    val before = spark.read.parquet(s"$out/lineitem.parquet").count()
    assert(!Menu.syncOne(spark, sfDir, out, "lineitem")) // guarded
    assert(spark.read.parquet(s"$out/lineitem.parquet").count() == before)
    assert(!new java.io.File(s"$out/sync_state_lineitem.parquet").exists(),
      "a skipped sync must not leave state behind")
    assert(Menu.dispatch(spark, sfDir, out, "3 nation"))
    assert(Menu.syncOne(spark, sfDir, out, "nation")) // unique key syncs
    assert(spark.read.parquet(s"$out/nation.parquet").count() == 25)
  }
}
