package graft

import org.apache.spark.sql.functions._

/** Diagnostic for the dedup_media scale tail: per modality, how many
  * DISTINCT media embeddings exist (the feature lattice is capped, so
  * distinct docs collide), the top group sizes, and the row-level vs
  * distinct-level LSH candidate volumes. Run at two SFs to see which
  * term grows quadratically.
  *
  * Usage: runMain graft.MediaProf [sfDir]
  */
object MediaProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .appName("media-prof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, dir, "documents")
    val feats = graft.extra.Multimodal.trainedFeatures(docs, s"$dir#media:documents")
    val emb = graft.Caching.temp(
      graft.extra.Multimodal.mediaEmbedding(feats, outDim = 36))

    val n = emb.count()
    println(s"== rows: $n")

    // distinct-vector groups per modality
    val groups = emb.groupBy(col("media_type"), col("embedding"))
      .agg(count(lit(1)).as("gsize"))
      .cache()
    val d = groups.count()
    println(s"== distinct (media_type, embedding) groups: $d")
    groups.groupBy("media_type")
      .agg(count(lit(1)).as("n_groups"), sum("gsize").as("n_rows"),
        max("gsize").as("max_group"),
        sum(col("gsize") * (col("gsize") - 1) / 2).as("within_pairs"))
      .orderBy("media_type").show(false)
    println("== top groups:")
    groups.orderBy(desc("gsize")).select("media_type", "gsize").show(10, false)

    // sign-LSH bucket occupancy, row level vs group level (4 bits x 9 tables)
    val dims = graft.extra.Dedup.signLshTableDims(4, 9)
    def keyed(df: org.apache.spark.sql.DataFrame) = {
      val vec = transform(col("embedding"), _.cast("double"))
      val tableKeys = dims.map { case (t, ds) =>
        struct(lit(t).as("tbl"),
          concat(ds.map(i =>
            when(element_at(vec, i) >= 0, "1").otherwise("0")): _*).as("bucket"))
      }
      df.select(col("media_type"), explode(array(tableKeys: _*)).as("k"))
        .select(col("media_type"), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    }
    def candVolume(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val v = keyed(df).groupBy("media_type", "tbl", "bucket")
        .agg(count(lit(1)).as("bn"))
        .groupBy("media_type")
        .agg(sum(col("bn") * (col("bn") - 1) / 2).as("cand_pairs"),
          max("bn").as("max_bucket"))
      println(s"== candidate volume ($label):")
      v.orderBy("media_type").show(false)
    }
    candVolume(emb, "row level")
    candVolume(groups.select(col("media_type"), col("embedding")), "group level")

    // the operator's actual output volume (the output-bound floor)
    val pairs = graft.extra.Multimodal.mediaNearDupPairs(feats, 0.99)
    pairs.groupBy("media_type").agg(count(lit(1)).as("n_pairs"))
      .orderBy("media_type").show(false)

    // component timings, image modality only
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2fs ($n rows)")
    }
    val in = emb.filter(col("media_type") === "image")
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val e = in.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    time("reps agg") { e.groupBy("vec").agg(min(col("vec_id")).as("gid")).count() }
    val reps = graft.Caching.temp(
      e.groupBy("vec").agg(min(col("vec_id")).as("gid")))
    val members = graft.Caching.temp(
      e.join(reps, "vec").select(col("vec_id"), col("gid")))
    time("members join") { members.count() }
    val repPairs = graft.extra.Dedup.embeddingPairsLsh(
      reps.select(col("gid").as("vec_id"), col("vec").as("embedding")), 0.99, 4, 9)
    time("rep-level LSH+verify") { repPairs.count() }
    time("rep-level LSH+verify (2nd)") { repPairs.count() }
    time("full collapsed") {
      graft.extra.Dedup.embeddingPairsLshCollapsed(in, 0.99, 4, 9).count() }
    // the row-level operator is known-quadratic in corpus size (the
    // finding this probe established); only run it at bench scale
    if (args.length > 1 && args(1) == "uncollapsed")
      time("full uncollapsed") {
        graft.extra.Dedup.embeddingPairsLsh(in, 0.99, 4, 9).count() }

    // stage-by-stage of the rep-level LSH
    val er = reps.select(col("gid").as("vec_id"), col("vec"))
    val dims2 = graft.extra.Dedup.signLshTableDims(4, 9)
    val tableKeys = dims2.map { case (t, ds) =>
      struct(lit(t).as("tbl"),
        concat(ds.map(i =>
          when(element_at(col("vec"), i) >= 0, "1").otherwise("0")): _*).as("bucket"))
    }
    val keyed2 = er.select(col("vec_id"), explode(array(tableKeys: _*)).as("k"))
      .select(col("vec_id"), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    time("keyed") { keyed2.count() }
    val cand2 = keyed2.as("a").join(keyed2.as("b"), Seq("tbl", "bucket"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    time("cand raw") { cand2.count() }
    val candD = cand2.distinct()
    time("cand distinct") { candD.count() }
    time("cand distinct (2nd)") { candD.count() }
    val ver = candD
      .join(er.select(col("vec_id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(er.select(col("vec_id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("cos_raw",
        graft.functions.VectorOps.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos_raw") >= 0.99)
    time("verify") { ver.count() }
    time("verify (2nd)") { ver.count() }

    // cluster-path decomposition (all modalities, the registered shape)
    val inAll = emb.select(col("media_type"), col("doc_id").as("vec_id"),
      col("embedding"))
    val eAll = inAll.select(col("media_type"), col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    val repsAll = graft.Caching.temp(eAll.groupBy("media_type", "vec")
      .agg(min(col("vec_id")).as("gid")))
    val repPairsAll = graft.extra.Dedup.embeddingPairsLshCollapsed(
      repsAll.select(col("media_type"), col("gid").as("vec_id"),
        col("vec").as("embedding")),
      0.99, 4, 9, partitionCols = Seq("media_type"))
    time("rep edges (verified, all modalities)") { repPairsAll.count() }
    val repEdges = graft.Caching.temp(
      repPairsAll.select(col("id_a"), col("id_b")))
    time("rep edges pinned") { repEdges.count() }
    time("ccDF over rep edges") {
      graft.extra.CorpusOps.connectedComponentsDF(
        repsAll.select(col("gid").as("id")),
        repEdges.select(col("id_a"), col("id_b"))).count() }
    time("full mediaNearDupClusters") {
      graft.extra.Multimodal.mediaNearDupClusters(feats, 0.99).count() }
    spark.stop()
  }
}
