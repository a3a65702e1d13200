package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for decontaminateSemanticLsh plan shape at scale. */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1.0")
    val spark = Prof.session("decprobe")
    graft.StageLog.attachIfEnabled(spark.sparkContext)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val bench = e.filter(col("vec_id") % 10 === 0)
    println(s"corpus=${corpus.count()} bench=${bench.count()}")
    // piecewise: candidate volume of the keyed join
    val c = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val b = bench.select(col("vec_id").as("bench_id"), col("embedding").cast("array<double>").as("bvec"))
    def keyed(df: org.apache.spark.sql.DataFrame, idc: String, vecc: String) = {
      val tableKeys = (0 until 12).map { t =>
        val dims = t * 3 + 1 to t * 3 + 3
        struct(lit(t).as("tbl"),
          concat(dims.map(i =>
            when(lit(i) <= size(col(vecc)),
              when(element_at(col(vecc), i) >= 0, "1").otherwise("0"))
              .otherwise("0")): _*).as("bucket"))
      }
      df.select(col(idc), col(vecc), explode(array(tableKeys: _*)).as("k"))
        .select(col(idc), col(vecc), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    }
    val joined = keyed(c, "vec_id", "vec")
      .join(broadcast(keyed(b, "bench_id", "bvec")), Seq("tbl", "bucket"))
    Prof.time("candidate count")(println("cands=" + joined.count()))
    val ver = joined
      .withColumn("cos_raw", graft.functions.VectorOps.cosine(col("vec"), col("bvec")))
      .filter(col("cos_raw") >= 0.45)
    Prof.time("verify count")(println("verified=" + ver.count()))
    Prof.time("v1: join ids noop (no cosine)")(
      joined.select(col("vec_id"), col("bench_id"))
        .write.mode("overwrite").format("noop").save())
    Prof.time("v2: cond-only ids noop")(
      ver.select(col("vec_id"), col("bench_id"))
        .write.mode("overwrite").format("noop").save())
    val selRaw = ver.select(col("vec_id"), col("bench_id"), col("cos_raw"))
    Prof.time("a0: verify+select RAW noop")(
      selRaw.write.mode("overwrite").format("noop").save())
    val sel = ver.select(col("vec_id"), col("bench_id"),
      round(col("cos_raw"), 6).as("cosine"))
    Prof.time("a: verify+select noop")(
      sel.write.mode("overwrite").format("noop").save())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cosine").desc, col("bench_id").asc)
    val winq = sel.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1).select("vec_id", "bench_id", "cosine")
    Prof.time("b: + window rn=1")(
      winq.write.mode("overwrite").format("noop").save())
    val out = graft.extra.Dedup.decontaminateSemanticLsh(corpus, bench, 0.45)
    Prof.time("lsh full")(out.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
