package graft

import org.apache.spark.sql.functions._
import graft.tools.Prof

/** Isolates the component pass on the media rep graph (the
  * dedup_media_clusters hot piece): builds the verified rep edges once,
  * pins them, then times the distributed loop (per-round with
  * GRAFT_CC_DEBUG), the GraphX form, the driver union-find and the full
  * registered operator. Usage: runMain graft.CcProf [sfDir]
  */
object CcProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = Prof.session("cc-prof")
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
    Prof.time("rep edges pinned") { repEdges.count() }
    val nodes = repsAll.select(col("gid").as("id"))
    Prof.time("ccDF (1st)") {
      graft.extra.CorpusOps.connectedComponentsDF(nodes, repEdges).count() }
    Prof.time("ccDF (2nd)") {
      graft.extra.CorpusOps.connectedComponentsDF(nodes, repEdges).count() }
    Prof.time("graphx cc") {
      graft.extra.CorpusOps.connectedComponents(nodes, repEdges).count() }
    Prof.time("ccAuto") {
      graft.extra.CorpusOps.connectedComponentsAuto(nodes, repEdges).count() }
    Prof.time("full clusters op (1st)") {
      graft.extra.Multimodal.mediaNearDupClusters(feats, 0.99).count() }
    Prof.time("full clusters op (2nd)") {
      graft.extra.Multimodal.mediaNearDupClusters(feats, 0.99).count() }
    spark.stop()
  }
}
