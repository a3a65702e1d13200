package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming incremental profiling — the Structured Streaming twin of the
  * batch [[graft.ingest.Profiler]]: as files land in a dataset directory,
  * the per-column statistical profile updates continuously instead of
  * re-running the batch job per drop (danae re-profiles a dataset when its
  * catalogue status flips to pending, ingest/profiling/profiler.py:56-86 —
  * here the "queue" is the stream itself).
  *
  * Shape: unpivot numeric columns into one (col_name, v) stream, then ONE
  * streaming aggregation keyed on col_name. All the emitted statistics
  * derive from commutative partial aggregates (count/sum/sumsq/min/max),
  * so Spark maintains them in the state store with map-side partial
  * combine — state size is O(#columns), independent of rows seen. Mean and
  * std are derived per emission (std via the sum-of-squares identity:
  * sqrt((Σv² - (Σv)²/n) / (n-1)) — the streaming equivalent of the batch
  * stddev_samp).
  */
object ProfileStream {

  /** Continuous numeric profile over a parquet-file stream. Update output
    * mode: each micro-batch emits the refreshed rows for columns that saw
    * data. No watermark — the profile is a running total over the life of
    * the dataset, exactly like the batch profile over the full table.
    */
  def numericStatsStream(spark: SparkSession, dir: String, schema: StructType,
                         datasetId: String, cols: Seq[String]): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(dir)
    val unpivoted = src.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
    unpivoted.groupBy("col_name")
      .agg(count(col("v")).as("n"),
        sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"),
        min(col("v")).as("vmin_raw"),
        max(col("v")).as("vmax_raw"))
      .select(lit(datasetId).as("dataset_id"), col("col_name"), col("n"),
        round(round(col("s"), 4) / col("n"), 6).as("mean"),
        // the sum-of-squares difference can round to a tiny NEGATIVE double
        // for large near-constant values (catastrophic cancellation) —
        // clamp at 0 so std is 0.0 where batch stddev_samp says ~0, not NaN
        round(sqrt(greatest(col("ss") - col("s") * col("s") / col("n"), lit(0.0))
          / (col("n") - 1)), 6).as("std"),
        round(col("vmin_raw"), 6).as("vmin"),
        round(col("vmax_raw"), 6).as("vmax"))
  }

  /** Streaming value-histogram cells — the quantile leg of the streaming
    * profile (numeric stats + HLL cardinality + this): per-window counts on
    * a FIXED [lo, hi) grid, one watermarked aggregation, mergeable by
    * construction (counts add). The grid is caller-supplied (from the batch
    * profile's min/max, the monitoring convention) because an unbounded
    * stream has no knowable range; out-of-range values clamp to the edge
    * buckets, so mass is never silently dropped. NaN is excluded like NULL
    * (it is unordered, not out-of-range — Spark's NaN-is-largest sort would
    * otherwise silently clamp NaN mass into the TOP cell and skew
    * [[histQuantiles]]). Quantile estimates stay on the read side
    * ([[histQuantiles]]) for the same reason the HLL estimate does:
    * emitting cells keeps windows re-mergeable downstream.
    */
  def histCellsStream(stream: DataFrame, valueCol: String, tsCol: String,
                      lo: Double, hi: Double, buckets: Int = 64,
                      window: String = "10 minutes",
                      horizon: String = "30 minutes"): DataFrame = {
    require(hi > lo && buckets > 0, "need hi > lo and buckets > 0")
    val w = (hi - lo) / buckets
    val b = least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) / lit(w)), lit(0)),
      lit(buckets - 1)).cast("int")
    stream
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .select(col(tsCol), lit(valueCol).as("col_name"), b.as("bucket"))
      .withWatermark(tsCol, horizon)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("col_name"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Read-side quantile fold over histogram cells (any number of merged
    * windows/shards): per group a ≤buckets-row cumulative pass picks the
    * bucket holding each target rank, linear within-bucket interpolation.
    * Resolution is one bucket width — the sketch trade, stated not hidden.
    *
    * @return (groupCols..., q, est) one row per group × quantile
    */
  def histQuantiles(cells: DataFrame, groupCols: Seq[String],
                    qs: Seq[Double], lo: Double, hi: Double,
                    buckets: Int = 64): DataFrame = {
    val w = (hi - lo) / buckets
    val byGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = cells
      .withColumn("cum", sum("cnt").over(byGroup))
      .withColumn("n", sum("cnt").over(tot))
    qs.map { q =>
      cum.withColumn("target", lit(q) * col("n"))
        .filter(col("cum") >= col("target"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))))
        .filter(col("rn") === 1)
        .select(groupCols.map(col) :+ lit(q).as("q") :+
          round(lit(lo) + lit(w) * (col("bucket") +
            (col("target") - (col("cum") - col("cnt"))) / col("cnt")), 6)
            .as("est"): _*)
    }.reduce(_.unionByName(_))
  }

  /** Streaming cardinality-over-time: per-window MERGEABLE HLL cells —
    * (window, col_name, bucket, max_rank), the same cells the batch
    * [[graft.extra.CardSketch.hllDistinct]] builds, maintained as ONE
    * watermarked streaming aggregation. The ESTIMATE deliberately stays on
    * the read side ([[graft.extra.CardSketch.hllEstimate]] over the sink —
    * m-row fold per window): emitting the mergeable artifact rather than
    * the folded number is what makes windows re-mergeable downstream
    * (day-from-hours rollups, cross-shard unions) and keeps the streaming
    * state at O(windows × columns × m) with max-merge partials.
    *
    * Append mode: each window's cells emit once the watermark passes.
    */
  def hllCellsStream(stream: DataFrame, valueCol: String, tsCol: String,
                     window: String = "10 minutes",
                     horizon: String = "30 minutes"): DataFrame = {
    val (bucket, rank) = graft.extra.CardSketch.hllBucketRank(
      col(valueCol).cast("string"))
    stream
      .filter(col(valueCol).isNotNull)
      .select(col(tsCol), lit(valueCol).as("col_name"),
        bucket.as("bucket"), rank.as("rank"))
      .withWatermark(tsCol, horizon)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("col_name"), col("bucket"))
      .agg(max("rank").as("max_rank"))
  }

  /** Streaming count-min cells — the FREQUENCY leg that completes the
    * streaming sketch family (numeric stats + histogram quantiles + HLL
    * cardinality + this): per-window mergeable CMS cells
    * (window, col_name, j, bucket, cnt) over a token/value stream, one
    * watermarked aggregation, state bounded at
    * O(windows × depth × width). Counts ADD, so windows re-merge into
    * hours/days and shards union, exactly like the histogram cells; the
    * heavy-hitter ESTIMATE stays on the read side
    * ([[graft.extra.CardSketch.cmsEstimate]] — min over the depth rows per
    * probe term), for the same reason the HLL estimate does. The hash rule
    * is [[graft.extra.CardSketch.cmsProbes]] — identical to the batch
    * sketch, so streamed and batch-built cells are one mergeable family
    * (spec-locked cell-equal in ProfileStreamSpec).
    *
    * Append mode: each window's cells emit once the watermark passes.
    */
  def cmsCellsStream(stream: DataFrame, termCol: String, tsCol: String,
                     window: String = "10 minutes",
                     horizon: String = "30 minutes"): DataFrame =
    stream
      .filter(col(termCol).isNotNull)
      .select(col(tsCol), lit(termCol).as("col_name"),
        explode(graft.extra.CardSketch.cmsProbes(
          col(termCol).cast("string"))).as("e"))
      .withWatermark(tsCol, horizon)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("col_name"), col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
}
