package graft.tools

import org.apache.spark.sql.functions.col

/** Per-family cost isolator for the streaming admission gate: drains the
  * same 4-micro-batch file stream through admitStreamMaintained with the
  * maintenance families enabled one at a time, so the probe/TF/pairs/gram
  * shares of the per-batch cost are visible. Usage:
  * runMain graft.tools.GateProf [sfDir]
  */
object GateProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session("gateprof")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val seed = docs.filter(col("doc_id") < 300)
      .filter(graft.extra.CorpusOps.sampleBucket(col("doc_id")) < 80)
      .select("doc_id", "text")
    val incoming = docs
      .filter(col("doc_id") >= 300 && col("doc_id") < 1300)
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("gateprof").toString
    (0 until 4).foreach { i =>
      incoming.filter(col("doc_id") % 4 === i)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val base = s"$sfDir#gateprof"
    def reset(): Unit = {
      graft.extra.Dedup.resetIndex(spark, base)
      graft.extra.Dedup.resetPairs(spark, base)
      graft.ingest.TermStats.resetTermFreqs(spark, base)
    }
    def drain(label: String, tf: Boolean, pairs: Boolean,
              gram: Boolean): Unit = {
      reset()
      graft.extra.Dedup.trainedIndex(seed, "doc_id", "text", s"$base:idx")
      if (gram) graft.extra.Dedup.trainedGramIndex(
        seed, "doc_id", "text", s"$base:gram", 20)
      if (tf) {
        graft.ingest.TermStats.trainedTermFreqs(
          seed, "doc_id", "text", s"$base:tf")
        graft.ingest.TermStats.trainedTermFreqs(
          seed, "doc_id", "text", s"$base:tf2", n = 2)
      }
      if (pairs) graft.extra.Dedup.trainedPairs(
        seed, "doc_id", "text", 0.95, s"$base:pairs")
      Prof.time(label) {
        val stream = spark.readStream.schema(incoming.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        val q = graft.streaming.CorpusStream.admitStreamMaintained(
          stream, seed, s"$base:idx", threshold = 0.95,
          tfCacheKeys =
            if (tf) Seq(s"$base:tf", s"$base:tf2") else Nil,
          pairsSpecs =
            if (pairs) Seq((s"$base:pairs", 0.95, false)) else Nil,
          gramSpecs = if (gram) Seq((s"$base:gram", 20)) else Nil) {
          (_, _) => ()
        }
        try q.processAllAvailable() finally q.stop()
      }
      graft.Caching.release()
    }
    drain("warmup (full)", tf = true, pairs = true, gram = true)
    drain("probe only", tf = false, pairs = false, gram = false)
    drain("probe+tf", tf = true, pairs = false, gram = false)
    drain("probe+pairs", tf = false, pairs = true, gram = false)
    drain("probe+gram", tf = false, pairs = false, gram = true)
    drain("full", tf = true, pairs = true, gram = true)
    reset()
    spark.stop()
  }
}
