package graft.tools

/** Component-cost isolator for the train_index bench line: times
  * Sketches.train, datasetMetadata, metaTermFreqs and metaStats
  * separately after a full reset, twice (cold then steady), with an
  * executor stack sample over the second pass.
  * Usage: runMain graft.tools.IdxProf [sfDir]
  */
object IdxProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Prof.session("idxprof")
    def pass(label: String): Unit = {
      graft.search.Sketches.reset(spark, dir)
      Prof.time(s"$label sketches.train")(
        graft.search.Sketches.train(spark, dir))
      Prof.time(s"$label datasetMetadata")(
        graft.search.CombinedScorer.datasetMetadata(spark, dir).count())
      Prof.time(s"$label metaTermFreqs")(
        { graft.search.CombinedScorer.metaTermFreqs(spark, dir); () })
      Prof.time(s"$label metaStats")(
        { graft.search.CombinedScorer.metaStats(spark, dir); () })
      graft.Caching.release()
    }
    pass("cold")
    val smp = Prof.sampler(15)
    pass("steady")
    smp.join(20000)
    // phase split of sketches.train (round 18): numericTemporal vs
    // categorical, timed to the noop sink, twice each
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    for (run <- 1 to 2) {
      Prof.time(s"numericTemporal run=$run")(
        noop(graft.search.Sketches.numericTemporal(spark, dir)))
      Prof.time(s"categorical run=$run")(
        noop(graft.search.Sketches.categorical(spark, dir)))
    }
    spark.stop()
  }
}
