package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Serving-conf A/B for the warm request path: jobs + latency per request
  * under (AQE on, parallelismFirst=false) — the bench's steady conf — vs
  * (AQE off, static shuffle.partitions=N) for small N, and 8-thread
  * concurrent batches under both. Usage:
  * runMain graft.tools.ServeProf [sfDir]
  */
object ServeProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session("serveprof")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    @volatile var jobs = 0
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (trace) sites.add(
          j.stageInfos.map(_.name).mkString("; ") +
            " | stages=" + j.stageInfos.size)
      }
    })
    val ids = graft.Tables.sketchTables
    def request(id: String): Unit = {
      graft.search.CombinedScorer.search(spark, sfDir, id)
        .write.mode("overwrite").format("noop").save()
      graft.Caching.release()
    }
    graft.search.Sketches.train(spark, sfDir)
    graft.search.CombinedScorer.datasetMetadata(spark, sfDir).count()
    graft.search.CombinedScorer.metaTermFreqs(spark, sfDir)
    graft.search.CombinedScorer.metaStats(spark, sfDir)
    ids.foreach(request) // warm per-dataset memos
    def mt(): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val futs = (0 until 16).map { i =>
          val id = ids(i % ids.size)
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = request(id)
          })
        }
        futs.foreach(_.get())
      } finally pool.shutdownNow()
    }
    def conf(aqe: Boolean, parts: Int, pf: Boolean): String = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf.toString)
      s"aqe=$aqe parts=$parts pf=$pf"
    }
    // per-job attribution of ONE warm request under the serving conf
    conf(aqe = false, parts = 2, pf = false)
    request("customer") // absorb any residual cold memo
    sites.clear(); jobs = 0; trace = true
    Prof.time("attributed single")(request("customer"))
    trace = false
    println(s"   jobs=$jobs")
    sites.forEach(s => println(s"   JOB $s"))
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      graft.search.CombinedScorer.search(spark, sfDir, "customer")
        .explain("formatted")
      graft.Caching.release()
    }
    for ((a, p, f) <- Seq((true, 32, false), (false, 2, false),
      (false, 4, false), (false, 1, false), (true, 32, false))) {
      val label = conf(a, p, f)
      (1 to 2).foreach { r =>
        jobs = 0
        Prof.time(s"single $label run=$r")(request("customer"))
        println(s"   jobs=$jobs")
      }
      (1 to 2).foreach { r =>
        jobs = 0
        Prof.time(s"mt16 $label run=$r")(mt())
        println(s"   jobs=$jobs")
      }
    }
    spark.stop()
  }
}
