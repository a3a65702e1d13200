package graft.tools

/** A/B spark.sql.optimizer.canChangeCachedPlanOutputPartitioning for the
  * pinned-frame query paths (round 18, VERDICT #5): the bm25_multifield
  * pipeline pins its catalogue-sized field-TF table with Caching.temp, and
  * by default AQE may not re-partition a cached plan — the pin materializes
  * at shuffle.partitions (= cores) partitions, so every downstream stat
  * branch launches ~cores tasks over a grid-sized frame. Interleaved in one
  * JVM. Usage: runMain graft.tools.CachePartProbe [sfDir] [reps]
  */
object CachePartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Prof.session("cachepartprobe")
    import org.apache.spark.sql.functions.col
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def bm25mf(): Unit = {
      noop(graft.search.Bm25.multiField(
        graft.search.CombinedScorer.datasetMetadata(spark, dir)
          .filter(col("dataset_id") =!= "customer")
          .withColumnRenamed("dataset_id", "doc_id"),
        "doc_id",
        // fixed stand-in query terms: the conf effect under test (cached
        // tf pin partitioning) is term-independent
        Seq(("title", 0.5, Seq("customer", "orders")),
          ("keywords", 0.3, Seq("customer", "key")),
          ("description", 0.2, Seq("table", "data")))))
      graft.Caching.release()
    }
    // more pin-heavy declared queries, run via the registry
    def q(name: String): Unit = {
      noop(graft.SparkEntry.queries(name)(spark, dir))
      graft.Caching.release()
    }
    val names = Seq("dedup_simhash", "dedup_spans", "source_kl", "hll_distinct")
    bm25mf(); names.foreach(q) // warm
    for (rep <- 1 to reps; flag <- Seq("false", "true")) {
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", flag)
      Prof.time(s"bm25_multifield cachedRepart=$flag rep=$rep")(bm25mf())
      names.foreach(n =>
        Prof.time(s"$n cachedRepart=$flag rep=$rep")(q(n)))
    }
    spark.stop()
  }
}
