package graft.tools

import graft.Tables
import graft.ingest.Profiler
import org.apache.spark.sql.functions._

/** numericTemporal hotspot isolator (round 17): times the sketch value
  * stream + histogram-quantile pipeline (the dominant train_index phase)
  * with the shared stack sampler, so per-task slowness can be attributed
  * to a frame (compute vs GC vs shuffle) instead of adjudicated on wall.
  * Usage: runMain graft.tools.NtProf [sfDir]
  */
object NtProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session("ntprof")
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (run <- 1 to 3) {
      val g0 = gcMs
      val smp = if (run == 2) Some(Prof.sampler(60)) else None
      Prof.time(s"valueStream+hist(spread) run=$run") {
        val loaded = Tables.sketchTables.map(t => t -> Tables.load(spark, dir, t))
        val stream = loaded.map { case (tb, df) =>
          Profiler.sketchValueStream(Profiler.spreadSketchCols(df), tb)
        }.reduce(_.unionAll(_))
        stream.groupBy("dataset_id", "col_name", "v")
          .agg(count(lit(1)).as("cnt"))
          .write.mode("overwrite").format("noop").save()
      }
      Prof.time(s"valueStream+hist(no spread) run=$run") {
        // A/B: columnar-scan-fused explode+agg straight off the parquet
        // tasks vs the repartitioned form above
        val loaded = Tables.sketchTables.map(t => t -> Tables.load(spark, dir, t))
        val stream = loaded.map { case (tb, df) =>
          Profiler.sketchValueStream(df, tb)
        }.reduce(_.unionAll(_))
        stream.groupBy("dataset_id", "col_name", "v")
          .agg(count(lit(1)).as("cnt"))
          .write.mode("overwrite").format("noop").save()
      }
      println(s"== gc run=$run: ${(gcMs - g0) / 1e3}s")
      smp.foreach(_.join(70000))
    }
    spark.stop()
  }
}
