package graft.tools

import org.apache.spark.sql.functions._

/** Probe: bitextMine (brute cross product + margin tail) hot-method check. */
object BitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1.0")
    val spark = Prof.session("bitprobe")
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    println(s"n=${e.count()}")
    val out = graft.extra.EmbeddingKnn.bitextMine(e)
    Prof.time("bitext_mine 1")(out.write.mode("overwrite").format("noop").save())
    Prof.time("bitext_mine 2")(out.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
