package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index-build profiler: times the train step and prints a deterministic
  * content hash of the pinned sketch index, so build changes can be checked
  * for bit-identical output across runs/variants (the bench only times it).
  * `TRAINPROF_AQE=false` re-measures without adaptive execution.
  */
object TrainProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("TRAINPROF_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StageLog.attachIfEnabled(spark.sparkContext)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"TRAINPROF $name: " + (System.nanoTime() - t0) / 1e9)
    }
    t("train(pin)") { search.Sketches.train(spark, sfDir) }
    Caching.release()
    t("datasetMetadata") {
      search.CombinedScorer.datasetMetadata(spark, sfDir).count()
    }
    val h = search.Sketches.cachedAll(spark, sfDir)
      .select(md5(concat_ws("|", col("dataset_id"), col("col_name"),
        col("col_type"), col("vector").cast("string"))).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .head()
    println(s"TRAINPROF index_hash: sum=${h.getLong(0)} n=${h.getLong(1)}")
    spark.stop()
  }
}
