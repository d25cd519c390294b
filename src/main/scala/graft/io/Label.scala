package graft.io

import org.apache.spark.SparkContext

/** Job labeling (guide §1.5): wrap a Spark ACTION so its jobs carry a
  * readable description in listener/UI views (JobProf attributes phases by
  * these). Thread-local, save/restore — labels never leak into the
  * caller's subsequent jobs. Outer labels win: a body that runs inside an
  * already-labeled scope keeps the outer label, so top-level phases stay
  * attributable when helpers also label. */
private[graft] object Label {
  def apply[T](sc: SparkContext, desc: String)(body: => T): T = {
    val prev = sc.getLocalProperty("spark.job.description")
    if (prev != null) body
    else {
      sc.setJobDescription(desc)
      try body finally sc.setJobDescription(null)
    }
  }
}
