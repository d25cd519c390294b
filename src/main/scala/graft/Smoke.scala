package graft

/** Local smoke: runs the flagship `SparkEntry.entry` (full migration on
  * sf0.001) exactly as the driver's t1 check does and prints the report. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.io.EngineSession.local(cpus.toInt)
    val df = SparkEntry.entry(spark)
    df.show(50, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
