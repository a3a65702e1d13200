package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Search-path profiler: stage/task counts and wall time for the flagship
  * similarity query, measured with AQE on and off each run, so stage-count
  * bloat in the many-small-stages search plan is visible without the
  * Spark UI.
  */
object SearchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var traceJobs = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (traceJobs) {
          val names = j.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(46)}(t=${si.numTasks})")
          println(s"  [job ${j.jobId}] ${names.mkString(" | ")}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    search.Sketches.train(spark, sfDir)
    search.CombinedScorer.datasetMetadata(spark, sfDir).count()
    Caching.release()
    def t(name: String)(f: => Unit): Unit = {
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(s"SEARCHPROF $name: ${sec}s jobs=$jobs stages=$stages tasks=$tasks")
    }
    traceJobs = sys.env.contains("GRAFT_TRACE_JOBS")
    for (run <- 1 to 3; aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      t(s"similarity_search aqe=$aqe run=$run") {
        SparkEntry.queries("similarity_search")(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      Caching.release()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
