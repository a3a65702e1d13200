package graft.extra

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
