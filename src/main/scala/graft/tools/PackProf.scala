package graft.tools

/** Diagnostic for corpus_pack's size-adaptive cumsum: times and explains
  * both packSequences paths — the gated fixture plan (global window) and
  * the forced two-level bucketed cumsum (the lake-scale shape, no
  * single-partition window). Usage: runMain graft.tools.PackProf [sfDir]
  */
object PackProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session("packprof")
    val docs = graft.Tables.load(spark, dir, "documents")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val flat = graft.extra.CorpusOps
      .packSequencesBucketed(docs, "doc_id", "text", 2048L, 1)
    val bucketed = graft.extra.CorpusOps.packSequencesBucketed(
      docs, "doc_id", "text", 2048L,
      spark.sessionState.conf.numShufflePartitions)
    Prof.time("flat (cold)")(noop(flat))
    Prof.time("flat (warm)")(noop(flat))
    Prof.time("bucketed (cold)") { noop(bucketed); graft.Caching.release() }
    Prof.time("bucketed (warm)") { noop(bucketed); graft.Caching.release() }
    println("===== corpus_pack forced two-level plan =====")
    bucketed.explain("formatted")
    spark.stop()
  }
}
