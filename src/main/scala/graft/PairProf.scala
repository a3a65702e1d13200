package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-artifact maintenance profiler: measures the O(batch) claim of
  * `Dedup.appendPairs` directly — full `trainedPairs` build over the
  * corpus slice vs appending batches an order of magnitude smaller, for
  * BOTH variants, plus the replay no-op cost. Prints one line per step
  * (wall seconds) and the served pair count after each, so a maintenance
  * change that silently degrades to a rebuild (or drops pairs) shows up
  * as numbers, not vibes.
  */
object PairProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    // corpus = first 80% of the DocBound slice; two 10% batches follow
    val bound = SparkEntry.DocBound
    val corpus = docs.filter(col("doc_id") < bound * 8 / 10)
    val b1 = docs.filter(col("doc_id") >= bound * 8 / 10 &&
      col("doc_id") < bound * 9 / 10)
    val b2 = docs.filter(col("doc_id") >= bound * 9 / 10 &&
      col("doc_id") < bound)
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PAIRPROF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (lsh <- Seq(false, true)) {
      val key = s"pairprof-${if (lsh) "lsh" else "exact"}"
      extra.Dedup.resetPairs(spark, key)
      t(s"build lsh=$lsh (80% corpus)") {
        extra.Dedup.trainedPairs(corpus, "doc_id", "text", 0.95, key, lsh)
      }
      t(s"append lsh=$lsh (10% batch)") {
        extra.Dedup.appendPairs(b1, "doc_id", "text", 0.95, key, lsh)
      }
      t(s"append lsh=$lsh (2nd 10%)") {
        extra.Dedup.appendPairs(b2, "doc_id", "text", 0.95, key, lsh)
      }
      t(s"replay lsh=$lsh (no-op)") {
        extra.Dedup.appendPairs(b1, "doc_id", "text", 0.95, key, lsh)
      }
      println(s"PAIRPROF served pairs lsh=$lsh: " +
        extra.Dedup.trainedPairs(corpus, "doc_id", "text", 0.95, key, lsh)
          .count())
      extra.Dedup.resetPairs(spark, key)
      Caching.release()
    }
    spark.stop()
  }
}
