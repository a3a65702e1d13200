package graft

import org.apache.spark.sql.functions._

/** Isolates connectedComponentsDF on the media rep graph (the
  * dedup_media_clusters hot piece): builds the verified rep edges once,
  * pins them, then times the component loop per round (GRAFT_CC_DEBUG).
  * Usage: runMain graft.CcProf [sfDir]
  */
object CcProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("cc-prof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2fs ($n rows)")
    }
    val docs = Tables.load(spark, dir, "documents")
    val feats = graft.extra.Multimodal.trainedFeatures(docs, s"$dir#media:documents")
    val emb = graft.Caching.temp(
      graft.extra.Multimodal.mediaEmbedding(feats, outDim = 36))
    val eAll = emb.select(col("media_type"), col("doc_id").as("vec_id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    val repsAll = graft.Caching.temp(eAll.groupBy("media_type", "vec")
      .agg(min(col("vec_id")).as("gid")))
    val repEdges = graft.Caching.temp(
      graft.extra.Dedup.embeddingPairsLshCollapsed(
        repsAll.select(col("media_type"), col("gid").as("vec_id"),
          col("vec").as("embedding")),
        0.99, 4, 9, partitionCols = Seq("media_type"))
        .select(col("id_a"), col("id_b")))
    time("rep edges pinned") { repEdges.count() }
    val nodes = repsAll.select(col("gid").as("id"))
    time("ccDF (1st)") {
      graft.extra.CorpusOps.connectedComponentsDF(nodes, repEdges).count() }
    time("ccDF (2nd)") {
      graft.extra.CorpusOps.connectedComponentsDF(nodes, repEdges).count() }
    time("graphx cc") {
      graft.extra.CorpusOps.connectedComponents(nodes, repEdges).count() }
    time("ccAuto") {
      graft.extra.CorpusOps.connectedComponentsAuto(nodes, repEdges).count() }
    time("full clusters op (1st)") {
      graft.extra.Multimodal.mediaNearDupClusters(feats, 0.99).count() }
    time("full clusters op (2nd)") {
      graft.extra.Multimodal.mediaNearDupClusters(feats, 0.99).count() }
    spark.stop()
  }
}
