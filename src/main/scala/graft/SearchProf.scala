package graft
import org.apache.spark.sql.SparkSession
object SearchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    search.Sketches.train(spark, sfDir)
    search.CombinedScorer.datasetMetadata(spark, sfDir).count()
    Caching.release()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"SEARCHPROF $name: " + (System.nanoTime() - t0) / 1e9)
    }
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
