package graft.tools

import org.apache.spark.sql.functions._

/** Stage-cost isolator for profile_numeric_stats: times the full
  * numericStatsAll, then its two branches separately — the per-table wide
  * moment aggs and the shared distinct value stream — with an executor
  * stack sample over the full query. Usage: runMain graft.tools.PnsProf
  * [sfDir]
  */
object PnsProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session("pnsprof")
    import graft.Tables
    val dfs = Tables.sketchTables.map(t => (t, Tables.load(spark, dir, t)))
    def full(): Long =
      graft.ingest.Profiler.numericStatsAll(dfs).count()
    Prof.time("full (cold)")(full())
    val smp = Prof.sampler(12)
    Prof.time("full (warm)")(full())
    smp.join(2000)
    // distinct branch alone: same value stream shape as numericStatsAll
    def distinctOnly(): Long = {
      val stream = dfs.map { case (id, df) =>
        val cols = graft.ingest.Profiler.typedColumns(df, "Numeric")
        df.selectExpr(cols.map(c => s"CAST(`$c` AS DOUBLE) AS `$c`"): _*)
          .select(expr(s"stack(${cols.size}, " +
            cols.map(c => s"'$c', `$c`").mkString(", ") + ") AS (col_name, v)"))
          .where(col("v").isNotNull)
          .select(lit(id).as("dataset_id"), col("col_name"), col("v"))
      }.reduce(_.unionAll(_))
      stream.distinct().groupBy("dataset_id", "col_name")
        .agg(count(lit(1)).as("n_distinct")).count()
    }
    Prof.time("distinct branch x2")(
      { distinctOnly(); distinctOnly() })
    spark.stop()
  }
}
