package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Per-JOB profiler for the multi-phase harness queries: runs each named
  * query once (noop sink) under a SparkListener and prints every Spark job
  * it submitted — wall time, stage/task counts, input and shuffle bytes,
  * and the call site — so the expensive PHASE inside a query like
  * `o3_bucketed_sync` (which runs many jobs: profile, decompose writes,
  * classify, bucket collect, staged writes, child merges) is attributable
  * instead of guessed. Driver-side gaps BETWEEN jobs (plan/optimize/fs
  * work) show up as the delta between a job's start and the previous
  * job's end, printed as `gap`.
  *
  * `runMain graft.JobProf o3_bucketed_sync st_sync_feed_update`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROF_WARM=1 runs each query once untimed first. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.get("SPARK_GRAFT_PROF_WARM").contains("1")
    val spark = graft.io.EngineSession.local(cpus.toInt, "ERROR")

    case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
        var site: String = "", var stages: Int = 0, var tasks: Int = 0,
        var inputB: Long = 0L, var shRead: Long = 0L, var shWrite: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val site = Option(e.properties).flatMap(p =>
            Option(p.getProperty("spark.job.description"))
              .orElse(Option(p.getProperty("callSite.short"))))
            .getOrElse("").linesIterator.take(1).mkString
          val r = JobRec(e.jobId, e.time, site = site,
            stages = e.stageIds.size)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
          jobs(e.jobId) = r
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { r =>
            r.tasks += si.numTasks
            val m = si.taskMetrics
            if (m != null) {
              r.inputB += m.inputMetrics.bytesRead
              r.shRead += m.shuffleReadMetrics.totalBytesRead
              r.shWrite += m.shuffleWriteMetrics.bytesWritten
            }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def mb(b: Long): String = f"${b / 1048576.0}%8.1f"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (warm) fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a moment
      // to drain (profiling tool — a lost tail event only underreports)
      Thread.sleep(300)
      println(f"\n===== $name%-30s total ${dt}%7.2f s =====")
      println("  job    ms    gap stages tasks  input(MB) shRd(MB) shWr(MB)  site")
      var prevEnd = 0L
      val snap = jobs.synchronized { jobs.values.toSeq.sortBy(_.t0) }
      var sumMs = 0L
      var sumGap = 0L
      snap.foreach { r =>
        val ms = math.max(0L, r.t1 - r.t0)
        val gap = if (prevEnd == 0L) 0L else math.max(0L, r.t0 - prevEnd)
        prevEnd = math.max(prevEnd, r.t1)
        sumMs += ms; sumGap += gap
        println(f"  ${r.id}%4d ${ms}%6d ${gap}%5d ${r.stages}%5d ${r.tasks}%6d " +
          f"${mb(r.inputB)} ${mb(r.shRead)} ${mb(r.shWrite)}  ${r.site}")
      }
      println(f"  jobs=${snap.size} in-job=${sumMs}ms between-job-gaps=${sumGap}ms " +
        f"(driver/planning/fs time incl. pre-first-job: " +
        f"${math.max(0L, (dt * 1000).toLong - sumMs - sumGap)}ms before jobs)")
    }
    spark.stop()
  }
}
