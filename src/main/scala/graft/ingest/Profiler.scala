package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical profiling of lake datasets (danae's `profile.report`).
  *
  * Reference semantics: ingest/profiling/profiler.py:53-131 (pandas-profiling
  * `minimal=True` + explicit temporal quantiles + spatial min/max) and
  * ingest/profiling/filters.py:92-135 (type mapping, quantile keys).
  *
  * Spark-first design: each dataset is profiled in a SINGLE aggregation pass
  * (one wide `agg` with every per-column expression), then unpivoted with
  * `stack` — no per-column jobs, no driver loops over rows. At 100 TB this is
  * one scan per dataset with map-side partial aggregation; the only caveat is
  * exact `count_distinct` (kept here because the DuckDB oracle needs exact
  * values — at production scale swap to `approx_count_distinct`, see
  * `distinctCountExpr`).
  */
object Profiler {

  /** Exact distinct count for oracle parity; at 100 TB use
    * approx_count_distinct(c, 0.01) — same call site, one flag.
    */
  def distinctCountExpr(c: Column, approx: Boolean): Column =
    if (approx) approx_count_distinct(c) else countDistinct(c)

  /** danae column-type mapping (filters.py:118-126 + profiler.py:84-99).
    * Spatial detection by column name, as in the reference (profiler.py:90-99)
    * — including the `lattitude` misspelling; without the reference's
    * single-column index bug (profiler.py:111).
    */
  def danaeType(field: StructField): String = {
    val n = field.name.toLowerCase
    val spatialNames = Set("long", "lng", "longitude", "latt", "lat", "lattitude")
    field.dataType match {
      case _ if spatialNames.contains(n)               => "Spatial"
      case _: NumericType                              => "Numeric"
      case TimestampType | TimestampNTZType | DateType => "Temporal"
      case StringType                                  => "Categorical"
      case _                                           => "Unsupported"
    }
  }

  def typedColumns(df: DataFrame, t: String): Seq[String] =
    df.schema.fields.filter(f => danaeType(f) == t).map(_.name).toSeq

  /** Table-level stats (profiler.py report.table; consumed ui/methods.py:108-118):
    * n, n_var, n_cells_missing, p_cells_missing, n_duplicates, p_duplicates.
    * One pass; duplicate count via multi-column distinct (map-side partial).
    */
  def tableStats(df: DataFrame, datasetId: String): DataFrame = {
    val cols = df.columns.toSeq
    val nVar = cols.size
    val missing = cols.map(c => count(when(col(c).isNull, 1)))
      .reduce(_ + _).as("n_cells_missing")
    // countDistinct over a struct, not bare columns: bare multi-column
    // countDistinct silently drops rows where ANY column is null, which would
    // count null-bearing rows as duplicates (the SQL `SELECT DISTINCT *`
    // oracle keeps them).
    df.agg(
      count(lit(1)).as("n"),
      missing,
      countDistinct(struct(cols.map(col): _*)).as("n_distinct_rows")
    ).select(
      lit(datasetId).as("dataset_id"),
      col("n"),
      lit(nVar).cast(LongType).as("n_var"),
      col("n_cells_missing"),
      round(col("n_cells_missing").cast(DoubleType) / (col("n") * nVar), 6)
        .as("p_cells_missing"),
      (col("n") - col("n_distinct_rows")).as("n_duplicates"),
      round((col("n") - col("n_distinct_rows")).cast(DoubleType) / col("n"), 6)
        .as("p_duplicates")
    )
  }

  /** Per-numeric-column stats in long format, one aggregation pass + stack.
    * Keys mirror filters.py:64-74 / pandas-profiling minimal stats.
    */
  def numericStats(df: DataFrame, datasetId: String, approx: Boolean = false): DataFrame = {
    val cols = typedColumns(df, "Numeric")
    require(cols.nonEmpty, s"$datasetId has no numeric columns")
    val aggs = cols.flatMap { c =>
      val d = col(c).cast(DoubleType)
      Seq(
        count(d).as(s"n__$c"),
        count(when(d.isNull, 1)).as(s"miss__$c"),
        distinctCountExpr(d, approx).as(s"dist__$c"),
        round(avg(d), 6).as(s"mean__$c"),
        round(stddev_samp(d), 6).as(s"std__$c"),
        round(min(d), 6).as(s"min__$c"),
        round(max(d), 6).as(s"max__$c")
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `n__$c`, `miss__$c`, `dist__$c`, `mean__$c`, `std__$c`, `min__$c`, `max__$c`"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) as " +
        "(col_name, n, n_missing, n_distinct, mean, std, vmin, vmax)"))
      .select(lit(datasetId).as("dataset_id"), col("*"))
  }

  private val sketchPercentages = "array(0.0D, 0.05D, 0.25D, 0.5D, 0.75D, 0.95D, 1.0D)"

  /** 7-dim percentile sketch vectors [min,5%,25%,50%,75%,95%,max] for every
    * Numeric and Temporal column (content_search.py:129-135,152-158;
    * quantile keys filters.py:128-130). Temporal vectors are epoch seconds
    * (content_search.py:157). Exact interpolated percentiles (Spark
    * `percentile`) so the DuckDB `quantile_cont` oracle agrees; elements
    * rounded to 6 decimals on BOTH sides to absorb float noise.
    * One aggregation pass per dataset; rows come out long via stack.
    */
  def quantileSketch(df: DataFrame, datasetId: String): DataFrame = {
    val numeric = typedColumns(df, "Numeric").map(c => (c, "Numeric"))
    val temporal = typedColumns(df, "Temporal").map(c => (c, "Temporal"))
    val cols = numeric ++ temporal
    require(cols.nonEmpty, s"$datasetId has no sketchable columns")
    // Temporal columns go through an explicit timestamp cast first: parquet
    // ms-timestamps surface as TimestampNTZ, which casts to epoch seconds in
    // the (UTC) session zone — matching DuckDB's epoch() on naive timestamps.
    val aggs = cols.map { case (c, t) =>
      val d = if (t == "Temporal") s"cast(cast(`$c` as timestamp) as double)"
              else s"cast(`$c` as double)"
      expr(s"transform(percentile($d, $sketchPercentages), x -> round(x, 6))")
        .as(s"v__$c")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { case (c, t) => s"'$c', '$t', `v__$c`" }.mkString(", ")
    wide.select(expr(s"stack(${cols.size}, $stackArgs) as (col_name, col_type, vector)"))
      .select(lit(datasetId).as("dataset_id"), col("*"))
  }

  /** Spatial bounding-box sketch [x_min, y_min, x_max, y_max]
    * (content_search.py:144-150, filters.py:132-135; min/max computation
    * profiler.py:90-99 incl. the decimal-comma fix for string coords).
    */
  def bboxSketch(df: DataFrame, datasetId: String, xCol: String, yCol: String): DataFrame = {
    def coerce(c: String): Column = df.schema(c).dataType match {
      case StringType => regexp_replace(col(c), ",", ".").cast(DoubleType)
      case _          => col(c).cast(DoubleType)
    }
    df.agg(
      round(min(coerce(xCol)), 6).as("x_min"),
      round(min(coerce(yCol)), 6).as("y_min"),
      round(max(coerce(xCol)), 6).as("x_max"),
      round(max(coerce(yCol)), 6).as("y_max")
    ).select(
      lit(datasetId).as("dataset_id"),
      lit(xCol).as("x_col"), lit(yCol).as("y_col"),
      col("x_min"), col("y_min"), col("x_max"), col("y_max"),
      array(col("x_min"), col("y_min"), col("x_max"), col("y_max")).as("vector"))
  }

  /** Column-type histogram per dataset (profiler.py:113,119,126 `types`
    * Counter). Pure schema derivation — no scan.
    */
  def typeHistogram(dfs: Seq[(String, DataFrame)]): Seq[(String, String, Long)] =
    dfs.flatMap { case (id, df) =>
      df.schema.fields.groupBy(danaeType).map { case (t, fs) => (id, t, fs.length.toLong) }
    }.sortBy(r => (r._1, r._2))
}
