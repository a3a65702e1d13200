package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Diagnostic stage-timing listener, shared by the ProfileBuild/Explain
  * mains and enabled with GRAFT_STAGES=1: one line per completed stage
  * (wall ms, task/record counts) — pinpoints hot or under-parallelized
  * stages without the Spark UI.
  */
object StageLog {
  def attachIfEnabled(sc: SparkContext): Unit =
    if (sys.env.contains("GRAFT_STAGES"))
      sc.addSparkListener(new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"wall=${wall.getOrElse(-1L)}%6d ms " +
            f"in=${si.taskMetrics.inputMetrics.recordsRead}%9d " +
            f"sh_r=${si.taskMetrics.shuffleReadMetrics.recordsRead}%9d " +
            f"sh_w=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%9d  " +
            si.name.takeWhile(_ != '\n').take(60))
        }
      })
}
