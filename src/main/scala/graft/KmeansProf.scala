package graft
import org.apache.spark.sql.SparkSession

/** A/B profiler for the two k-means centroid-update paths
  * (extra/Clustering): declarative posexplode + (cluster, dim) hash
  * aggregate vs the flat-buffer VectorSumTruncMean Aggregator. Interleaved
  * min-of-N so co-tenant drift hits both arms equally.
  */
object KmeansProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = Tables.load(spark, sfDir, "embeddings")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(s"KMEANSPROF $name: " + (System.nanoTime() - t0) / 1e9)
      Caching.release()
    }
    for (run <- 1 to 3) {
      t(s"declarative run=$run") {
        extra.Clustering.kmeansAssignImpl(emb, 8, 3, aggUpdate = false)
          .write.mode("overwrite").format("noop").save()
      }
      t(s"aggregator run=$run") {
        extra.Clustering.kmeansAssignImpl(emb, 8, 3, aggUpdate = true)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
