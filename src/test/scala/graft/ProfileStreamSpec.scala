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

  test("streamed histogram cells equal batch; quantile fold within a bucket") {
    val events = Tables.load(spark, SparkTestSession.sf0001, "events")
      .select(col("ts"), col("value"))
    val (lo, hi, buckets) = (0.0, 400.0, 64)  // covers the fixture's 0–328
    val dir = java.nio.file.Files.createTempDirectory("hist_stream").toString
    events.filter(col("value") < 50).coalesce(1).write.mode("append").parquet(dir)
    events.filter(col("value") >= 50).coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = ProfileStream.histCellsStream(stream, "value", "ts",
        lo, hi, buckets, window = "10 minutes", horizon = "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hist_cells").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hist_cells")
    val w = (hi - lo) / buckets
    val b = least(greatest(floor((col("value").cast("double") - lit(lo)) / lit(w)),
      lit(0)), lit(buckets - 1)).cast("int")
    val batchCells = events.filter(col("value").isNotNull)
      .select(window(col("ts"), "10 minutes").as("window"),
        lit("value").as("col_name"), b.as("bucket"))
      .groupBy("window", "col_name", "bucket").agg(count(lit(1)).as("cnt"))
    def cellSet(df: org.apache.spark.sql.DataFrame) = df.select(
        col("window.start").cast("long"), col("bucket"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(cellSet(streamed) == cellSet(batchCells))
    assert(cellSet(streamed).nonEmpty)

    // merged-windows quantile fold lands within one bucket width of exact
    val merged = streamed.groupBy(lit("value").as("col_name"), col("bucket"))
      .agg(sum("cnt").as("cnt"))
    val est = ProfileStream.histQuantiles(merged, Seq("col_name"),
        Seq(0.5, 0.9), lo, hi, buckets).collect()
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val vals = events.select(col("value").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    Seq(0.5, 0.9).foreach { qq =>
      val exact = vals(math.min((qq * vals.length).toInt, vals.length - 1))
      assert(math.abs(est(qq) - exact) <= w + 1e-9,
        s"q=$qq est=${est(qq)} exact=$exact")
    }
  }

  test("streamed HLL cells equal the batch cells; estimates fold identically") {
    import graft.extra.CardSketch
    val events = Tables.load(spark, SparkTestSession.sf0001, "events")
      .select(col("ts"), col("user_id"))
    val dir = java.nio.file.Files.createTempDirectory("hll_stream").toString
    events.filter(col("user_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    events.filter(col("user_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = ProfileStream.hllCellsStream(stream, "user_id", "ts",
        window = "10 minutes", horizon = "30 minutes")
      // complete mode in the spec so EVERY window is visible without
      // driving the watermark past the last event
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_cells").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hll_cells")
    // batch twin: same bucket/rank expressions, same windowing
    val (bucket, rank) = CardSketch.hllBucketRank(col("user_id").cast("string"))
    val batchCells = events.filter(col("user_id").isNotNull)
      .select(window(col("ts"), "10 minutes").as("window"),
        lit("user_id").as("col_name"), bucket.as("bucket"), rank.as("rank"))
      .groupBy("window", "col_name", "bucket")
      .agg(max("rank").as("max_rank"))
    def cellSet(df: org.apache.spark.sql.DataFrame) = df.select(
        col("window.start").cast("long"), col("col_name"), col("bucket"),
        col("max_rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(cellSet(streamed) == cellSet(batchCells))
    assert(cellSet(streamed).nonEmpty)

    // read-side fold gives the same estimate from either side, and windows
    // re-merge: folding ALL windows' cells equals the whole-table sketch
    val estS = CardSketch.hllEstimate(
      streamed.select(col("window.start").cast("long").as("w"), col("col_name"),
        col("bucket"), col("max_rank")), Seq("w", "col_name")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val estB = CardSketch.hllEstimate(
      batchCells.select(col("window.start").cast("long").as("w"), col("col_name"),
        col("bucket"), col("max_rank")), Seq("w", "col_name")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(estS == estB)
    val merged = CardSketch.hllEstimate(
      streamed.groupBy("col_name", "bucket").agg(max("max_rank").as("max_rank")),
      Seq("col_name")).collect()(0).getDouble(1)
    val whole = CardSketch.hllDistinct(
        events.select(lit("user_id").as("col_name"),
          col("user_id").cast("string").as("v")).filter(col("v").isNotNull))
      .collect()(0).getDouble(1)
    assert(merged == whole, s"merged $merged vs whole-table $whole")
  }

  test("streamed CMS cells equal the batch cells; merged estimate = whole-table") {
    import graft.extra.CardSketch
    val events = Tables.load(spark, SparkTestSession.sf0001, "events")
      .select(col("ts"), col("event_type"))
    val dir = java.nio.file.Files.createTempDirectory("cms_stream").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = graft.streaming.ProfileStream.cmsCellsStream(
        stream, "event_type", "ts",
        window = "10 minutes", horizon = "30 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_cells").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("cms_cells")
    // batch twin: same probe structs, same windowing
    val batchCells = events.filter(col("event_type").isNotNull)
      .select(window(col("ts"), "10 minutes").as("window"),
        lit("event_type").as("col_name"),
        explode(CardSketch.cmsProbes(col("event_type").cast("string"))).as("e"))
      .groupBy(col("window"), col("col_name"),
        col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    def cellSet(df: org.apache.spark.sql.DataFrame) = df.select(
        col("window.start").cast("long"), col("col_name"), col("j"),
        col("bucket"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(cellSet(streamed) == cellSet(batchCells))
    assert(cellSet(streamed).nonEmpty)

    // windows re-merge: summing every window's cells then probing equals
    // the whole-table CMS estimate (the classic min-over-depth bound)
    val mergedCells = streamed.groupBy("j", "bucket")
      .agg(sum("cnt").as("cnt"))
    val probes = events.select(col("event_type").cast("string").as("term"))
      .filter(col("term").isNotNull).distinct()
    val estMerged = CardSketch.cmsEstimate(mergedCells, probes).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val estWhole = CardSketch.heavyHitters(
        events.select(col("event_type").cast("string").as("term"))
          .filter(col("term").isNotNull), k = 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estMerged == estWhole,
      s"merged-window estimates $estMerged must equal whole-table $estWhole")
    // CMS invariant: estimate >= true count, everywhere
    val trueCounts = events.groupBy(col("event_type").cast("string").as("term"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    trueCounts.foreach { case (t, n) =>
      assert(estMerged(t) >= n, s"CMS bound violated for $t")
    }
  }
}
