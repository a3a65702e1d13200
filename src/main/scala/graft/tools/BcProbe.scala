package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Micro-probe: which broadcast build shapes submit Spark JOBS on this
  * runtime? (a) broadcast over a pure LocalRelation, (b) broadcast over a
  * LocalRelation with a projection, (c) scalar literal filter (no join).
  * The warm serving path's per-request job count is driver-latency-bound,
  * so each jobless shape is one fewer DAGScheduler round-trip per request.
  */
object BcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session("bcprobe")
    import spark.implicits._
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    val big = spark.range(100000).toDF("id")
      .withColumn("k", col("id") % 100)
    big.write.mode("overwrite").format("noop").save() // warm
    val local = spark.createDataFrame(
      java.util.Arrays.asList(
        (0 until 50).map(i => org.apache.spark.sql.Row(i.toLong)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    def run(label: String)(f: => Unit): Unit = {
      Thread.sleep(200); jobs = 0; f
      println(s"PROBE $label jobs=$jobs")
    }
    run("baseline noop big")(big.write.mode("overwrite").format("noop").save())
    run("bhj over pure LocalRelation")(
      big.join(broadcast(local), "k")
        .write.mode("overwrite").format("noop").save())
    run("bhj over LocalRelation+project")(
      big.join(broadcast(local.select(col("k"), (col("k") * 2).as("k2"))), "k")
        .write.mode("overwrite").format("noop").save())
    run("semi-join via isin literal")(
      big.filter(col("k").isin((0L until 50L): _*))
        .write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
