package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Size-targeted parquet writing — the sink-side discipline that keeps a
  * 100 TB lake healthy: a pipeline that writes one file per reducer
  * produces millions of tiny files (NameNode/listing pressure, per-file
  * open cost dominating scans), while one giant file kills scan
  * parallelism when row groups degenerate (the fixture's own single-row-
  * group files serialize whole-table scans — see Profiler.spreadSketchCols).
  */
object Compaction {

  /** Catalyst's pre-action size estimate for a frame (bytes). Plan-time
    * only — no job runs; post-shuffle accuracy is what repartition needs.
    */
  def estimatedBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.min(Long.MaxValue).toLong

  /** Write `df` as parquet files of ~`targetFileBytes` each (pre-compression
    * estimate), optionally sorted within files by `sortCols` — sorting
    * clusters similar values so parquet RLE/dictionary pages compress
    * harder and min/max page stats actually prune. The partition count
    * comes from the plan-time size estimate: no extra counting job.
    */
  def write(df: DataFrame, path: String, targetFileBytes: Long = 128L << 20,
            sortCols: Seq[String] = Nil,
            mode: SaveMode = SaveMode.Overwrite): Int = {
    // ceil without the +target-1 trick: statless sources estimate at
    // Long.MaxValue (spark.sql.defaultSizeInBytes) and the addition would
    // wrap negative — collapsing a huge write into ONE file
    val est = estimatedBytes(df)
    val n = math.max(1L, math.min(
      est / targetFileBytes + (if (est % targetFileBytes == 0) 0 else 1),
      1L << 20)).toInt
    val repartitioned =
      if (sortCols.nonEmpty)
        // repartition BY the sort key range → each file owns a disjoint
        // key range (global clustering), then sort inside each file
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    repartitioned.write.mode(mode).parquet(path)
    n
  }
}
