package graft

/** Query profiler: times each named query `SPARK_GRAFT_PROF_RUNS` times
  * (default 3) on SPARK_GRAFT_SF_DIR with the same session shape as Bench,
  * separating first-run (plan + codegen + scan-cold) cost from steady state.
  * `runMain graft.Prof q5_nation_revenue dedup_components` */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "3").toInt
    val spark = graft.io.EngineSession.local(cpus.toInt, "ERROR")
    spark.conf.set("spark.graft.eagerMaterialize",
      sys.env.getOrElse("SPARK_GRAFT_EAGER", "false"))
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${times.map(t => f"$t%7.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
