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
  }
}
