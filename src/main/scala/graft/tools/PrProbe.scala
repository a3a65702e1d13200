package graft.tools

import org.apache.spark.sql.functions.col

/** A/B checkpoint cadence for the doc_pagerank iteration (round 18,
  * VERDICT #7 — the query is fixed per-round-latency-bound): times
  * pagerankNano over the warm trained pair artifact at several
  * checkpointEvery values, interleaved in one JVM.
  * Usage: runMain graft.tools.PrProbe [sfDir] [reps]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Prof.session("prprobe")
    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 10000)
    val pairs = graft.extra.Dedup.trainedPairs(docs, "doc_id", "text", 0.95,
      s"$dir#prprobe_pairs", lsh = true).select("id_a", "id_b")
    def run(ck: Int): Unit = {
      graft.extra.GraphOps.pagerankNano(pairs, "id_a", "id_b",
        checkpointEvery = ck)
        .write.mode("overwrite").format("noop").save()
      graft.Caching.release()
    }
    run(2) // warm (fills the pair artifact + JIT)
    for (rep <- 1 to reps; ck <- Seq(1, 2, 5, 10))
      Prof.time(s"pagerank ck=$ck rep=$rep")(run(ck))
    spark.stop()
  }
}
