package graft

import graft.workflow.Menu

/** O8: menu dispatch — each option drives the engine API; q exits. */
class MenuSpec extends SparkSpec {
  

  test("menu options dispatch and report; q exits; unknown tolerated") {
    val out = java.nio.file.Files.createTempDirectory("graft_menu").toString
    assert(Menu.dispatch(spark, sfDir, out, "1"))
    assert(Menu.dispatch(spark, sfDir, out, "2"))
    assert(Menu.dispatch(spark, sfDir, out, "3")) // full migration
    assert(Menu.dispatch(spark, sfDir, out, "4")) // sync (target now exists)
    assert(Menu.dispatch(spark, sfDir, out, "6"))
    assert(Menu.dispatch(spark, sfDir, out, "zz"))
    assert(!Menu.dispatch(spark, sfDir, out, "q"))
    // the migration dispatched above actually wrote tables
    assert(spark.read.parquet(s"$out/odocs.parquet").count() == 1500)
  }
}
