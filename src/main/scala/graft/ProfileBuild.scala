package graft

import graft.search.Sketches
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: time the sketch-index build sub-steps. */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StageLog.attachIfEnabled(spark.sparkContext)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[build] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("numericTemporal") {
      Sketches.numericTemporal(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    time("categorical") {
      Sketches.categorical(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    time("cachedAll") { Sketches.cachedAll(spark, sfDir).count() }
    time("cachedAll-2nd") { Sketches.cachedAll(spark, sfDir).count() }
    spark.stop()
  }
}
