package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Provenance tool for [[graft.extra.Multimodal.mediaEmbedding]]'s
  * prior-epoch whitening constants: prints the per-modality decoded-feature
  * profile (mean/std/min/max per informative dim) of the synthesized
  * corpus. Re-run after any change to `synthesizeEncoded`'s stat→shape
  * mappings and paste the new stats into the `centered` table (keeping the
  * max(σ, 2·edit-jump) divisor floor documented there).
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val feats = graft.extra.Multimodal.extractFeaturesRouted(
      graft.extra.Multimodal.synthesizeEncoded(
        graft.Tables.load(spark, sfDir, "documents")))
    val exploded = feats.select(col("media_type"),
      posexplode(col("features")).as(Seq("dim", "v")))
    exploded.groupBy("media_type", "dim")
      .agg(round(avg("v"), 4).as("mean"), round(stddev("v"), 4).as("std"),
        round(min("v"), 4).as("mn"), round(max("v"), 4).as("mx"))
      .filter(col("std") > 0)
      .orderBy("media_type", "dim")
      .show(60, false)
    spark.stop()
  }
}
