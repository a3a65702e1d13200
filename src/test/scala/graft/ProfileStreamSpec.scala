package graft

import graft.streaming.ProfileStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming numeric profile converges to the batch profile") {
    val orders = Tables.load(spark, SparkTestSession.sf0001, "orders")
    val cols = Seq("o_totalprice", "o_custkey")
    // land the table in two file drops so the profile must accumulate
    // across micro-batches (maxFilesPerTrigger below forces that split)
    val dir = java.nio.file.Files.createTempDirectory("prof_stream").toString
    orders.filter(col("o_orderkey") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    orders.filter(col("o_orderkey") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = ProfileStream.numericStatsStream(
      spark, dir, orders.schema, "orders", cols)
    val q = stream.writeStream.outputMode("complete")
      .option("maxFilesPerTrigger", "1")
      .format("memory").queryName("prof_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("prof_out").collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"),
          r.getAs[Double]("vmin"), r.getAs[Double]("vmax")))).toMap
    val batch = graft.ingest.Profiler.numericStats(orders, "orders")
      .filter(col("col_name").isin(cols: _*)).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"),
          r.getAs[Double]("vmin"), r.getAs[Double]("vmax")))).toMap
    assert(got == batch)

    // std agrees with the batch stddev_samp within the rounding grid (the
    // streaming side uses the sum-of-squares identity)
    val stdS = spark.table("prof_out").collect()
      .map(r => r.getString(1) -> r.getAs[Double]("std")).toMap
    val stdB = graft.ingest.Profiler.numericStats(orders, "orders")
      .filter(col("col_name").isin(cols: _*)).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Double]("std")).toMap
    cols.foreach { c => assert(math.abs(stdS(c) - stdB(c)) < 1e-4, s"std($c)") }
  }
}
