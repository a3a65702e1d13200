package graft.tools

/** A/B the profile/sketch tail stages under AQE partition-coalescing
  * variants (round 18, VERDICT #2 — 32-core anti-scaling of the
  * post-aggregation stages over grid-sized frames): times
  * Sketches.numericTemporal and Profiler.numericStatsAll warm under
  *  (a) the bench default (parallelismFirst=true — AQE keeps ~cores
  *      post-shuffle partitions no matter how tiny the data),
  *  (b) parallelismFirst=false + advisory 8m,
  *  (c) parallelismFirst=false + advisory 64m,
  * interleaved in ONE JVM so JIT/co-tenant drift can't masquerade as a
  * conf effect. Usage: runMain graft.tools.AqeProbe [sfDir] [reps]
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Prof.session("aqeprobe")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def nt(): Unit = noop(graft.search.Sketches.numericTemporal(spark, dir))
    def pns(): Unit = {
      val dfs = graft.Tables.sketchTables
        .map(t => (t, graft.Tables.load(spark, dir, t)))
      noop(graft.ingest.Profiler.numericStatsAll(dfs))
    }
    def conf(pf: Boolean, advisory: String): Unit = {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
    }
    // warm both pipelines once under default conf
    nt(); pns()
    for (rep <- 1 to reps) {
      for ((label, pf, adv) <- Seq(("default pf=true", true, "64m"),
        ("pf=false adv=8m", false, "8m"),
        ("pf=false adv=64m", false, "64m"))) {
        conf(pf, adv)
        Prof.time(s"numericTemporal $label rep=$rep")(nt())
        Prof.time(s"numericStatsAll $label rep=$rep")(pns())
      }
    }
    spark.stop()
  }
}
