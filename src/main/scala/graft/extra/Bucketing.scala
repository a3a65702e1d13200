package graft.extra

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-location — the fact-to-fact join strategy at 100 TB:
  * write both sides bucketed (and sorted) by the join key so the join
  * executes with NO shuffle exchange on either side (sort-merge over
  * co-located buckets). Broadcast handles dimension tables; bucketing
  * handles the lineitem⋈orders class of joins where neither side fits in
  * memory. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two pre-bucketed tables on their bucket key. With matching bucket
    * counts Catalyst plans SortMergeJoin with neither side exchanged.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))

  /** True if the executed plan contains a shuffle exchange. Handles AQE:
    * after execution shuffles surface as ShuffleQueryStage nodes inside the
    * adaptive plan, so inspect the final plan's rendering.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    s.contains("Exchange hashpartitioning") || s.contains("ShuffleQueryStage")
  }

  // ---------------------------------------------------------------------
  // Z-order layout
  // ---------------------------------------------------------------------

  /** Bits per dimension for the Z-curve (256 buckets each — the Delta-Lake
    * OPTIMIZE ZORDER default ballpark; two dims interleave into a 16-bit
    * z-value).
    */
  val ZBits = 8

  /** Bit-interleave two bucket ids into their Morton (Z-curve) value —
    * `bits` terms of pure integer bit ops, whole-stage codegen.
    */
  def zInterleave(x: Column, y: Column, bits: Int = ZBits): Column =
    (0 until bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1)) * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)

  /** NULL in → NULL out: without the isNotNull guard, floor(NULL) is NULL
    * and both Spark's and DuckDB's least() SKIP NULLs, so NULL-valued rows
    * would silently cluster at the max corner (bucket 2^bits-1).
    */
  private def zBucket(v: Column, mn: Column, mx: Column, bits: Int): Column =
    when(v.isNotNull && (mx > mn),
      least(floor((v - mn) / (mx - mn) * (1 << bits)).cast("int"),
        lit((1 << bits) - 1)))
      .otherwise(when(v.isNotNull, 0))

  /** Z-order (Morton-curve) layout key for two numeric columns — the
    * multi-dimensional file-clustering strategy for 100 TB scans: range
    * buckets per dimension from the global (min, max), bit-interleaved into
    * one sort key. `repartitionByRange(zval)` + per-file min/max parquet
    * stats then prune scans on EITHER predicate column (a single-column
    * sort clusters only its own column; the Z-curve bounds every file in a
    * hyper-rectangle of BOTH). The (min, max) scalars ride a broadcast
    * 1-row join — no driver action, one lazily-planned job; the layout
    * write itself is one range shuffle.
    *
    * @return input id column + (xb, yb, zval)
    */
  def zorderKey(df: DataFrame, idCol: String, xCol: String, yCol: String,
                bits: Int = ZBits): DataFrame = {
    val m = df.agg(
      min(col(xCol).cast("double")).as("mnx"),
      max(col(xCol).cast("double")).as("mxx"),
      min(col(yCol).cast("double")).as("mny"),
      max(col(yCol).cast("double")).as("mxy"))
    df.crossJoin(broadcast(m))
      .select(
        col(idCol),
        zBucket(col(xCol).cast("double"), col("mnx"), col("mxx"), bits).as("xb"),
        zBucket(col(yCol).cast("double"), col("mny"), col("mxy"), bits).as("yb"))
      .withColumn("zval", zInterleave(col("xb"), col("yb"), bits).cast("long"))
  }

  /** DuckDB twin of [[zorderKey]] — generated from the same bit terms so
    * the two sides cannot drift.
    */
  def zorderSqlFor(table: String, idCol: String, xCol: String, yCol: String,
                   bits: Int = ZBits): String = {
    def bucket(v: String, mn: String, mx: String) =
      s"""CASE WHEN $v IS NULL THEN NULL
         | WHEN $mx > $mn THEN least(CAST(floor((CAST($v AS DOUBLE) - $mn)
         | / ($mx - $mn) * ${1 << bits}) AS INT), ${(1 << bits) - 1})
         | ELSE 0 END""".stripMargin.replace("\n", " ")
    val terms = (0 until bits).map { b =>
      s"((xb >> $b) & 1) * ${1L << (2 * b)} + ((yb >> $b) & 1) * ${1L << (2 * b + 1)}"
    }
    s"""WITH m AS (SELECT min(CAST($xCol AS DOUBLE)) AS mnx, max(CAST($xCol AS DOUBLE)) AS mxx,
       |  min(CAST($yCol AS DOUBLE)) AS mny, max(CAST($yCol AS DOUBLE)) AS mxy FROM $table),
       |b AS (SELECT $idCol,
       |  ${bucket(xCol, "mnx", "mxx")} AS xb,
       |  ${bucket(yCol, "mny", "mxy")} AS yb
       | FROM $table, m)
       |SELECT $idCol, xb, yb,
       | CAST(${terms.mkString("\n  + ")} AS BIGINT) AS zval
       |FROM b""".stripMargin
  }
}
