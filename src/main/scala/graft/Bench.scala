package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged startup cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    var failed = List.empty[String]
    def timed(name: String)(f: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try f
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name: $e"); failed ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Optional comma-separated query-name filter for local iteration
    // (SPARK_GRAFT_ONLY=doc_pagerank,bpe_pairs); the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Explicit train steps (danae builds its index at startup, not per
    // query; the BPE merge table is likewise a session artifact): each is
    // charged honestly as its own line, and the queries after them measure
    // steady-state search/encode. A train line filtered out by
    // SPARK_GRAFT_ONLY is OMITTED (not emitted near-zero) — but note the
    // filtered query that first touches the cold cache then pays its build.
    //
    // Train lines are min-of-2 like every other query, each run a TRUE
    // rebuild (the session memo is reset between runs — a bare second call
    // would be a cache hit by design). Uniform methodology: before this,
    // the train lines were the only single-sample numbers in the bench, so
    // they alone carried this microVM's full co-tenant variance — measured
    // at 13.8–18.3s across 5 isolated single-draw train_index runs, which
    // is what repeatedly read as a "regression" (PLANS.md round-10).
    val trainSteps: Seq[(String, () => Unit, () => Unit)] = Seq(
      ("train_index",
        () => search.Sketches.reset(spark, sfDir),
        () => {
          search.Sketches.train(spark, sfDir)
          search.CombinedScorer.datasetMetadata(spark, sfDir).count()
          // the shared BM25 TF artifact belongs to the same index family
          search.CombinedScorer.metaTermFreqs(spark, sfDir)
          ()
        }),
      ("train_bpe",
        () => extra.TextStats.resetMerges(spark, sfDir),
        () => {
          extra.TextStats.trainedMerges(
            Tables.load(spark, sfDir, "documents"), "text", 8, Some(sfDir))
          ()
        }),
      ("train_nb",
        () => extra.Classifier.resetModels(spark, sfDir),
        () => {
          extra.Classifier.trainedModel(
            Tables.load(spark, sfDir, "documents"), "doc_id", "text",
            org.apache.spark.sql.functions.col("source")
              .isin("src1", "src2", "src3"), sfDir)
          ()
        }),
      ("train_dedup_idx",
        () => extra.Dedup.resetIndex(spark, sfDir),
        () => {
          // same corpus slice the registered dedup_incremental gate probes
          val docs = Tables.load(spark, sfDir, "documents")
            .filter(org.apache.spark.sql.functions.col("doc_id")
              < SparkEntry.DocBound)
          extra.Dedup.trainedIndex(
            docs.filter(extra.CorpusOps.sampleBucket(
              org.apache.spark.sql.functions.col("doc_id")) < 80),
            "doc_id", "text", s"$sfDir#dedup_idx")
          ()
        }))
    val trained = trainSteps
      .filter { case (name, _, _) => only.forall(_.contains(name)) }
      .map { case (name, reset, fn) =>
        val times = (1 to 2).map { i =>
          if (i > 1) reset()
          val t = timed(name)(fn())._2
          // build-time ephemeral pins only — the sketch/metadata index and
          // the merge-table cache are owned by Sketches/CombinedScorer/
          // TextStats, not the registry, and survive this. The last build
          // leaves the session caches populated for the queries that follow.
          Caching.release()
          t
        }
        name -> times.min
      }
    // noop sink: forces full materialization of every column (count() would
    // let Catalyst prune per-row work like hashes and scores).
    // Two runs per query, best kept: this microVM has heavy co-tenant noise
    // (the same query swings 3x run-to-run), and min-of-2 measures the
    // steady-state throughput a warm service would see. Training is charged
    // once — its second invocation would hit the session cache by design.
    val runsPerQuery = 2
    val results = (trained ++ SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runsPerQuery).map { _ =>
        val t = timed(name)(fn(spark, sfDir).write.mode("overwrite").format("noop").save())._2
        // drop this query's ephemeral pins (TF tables etc.) before the next
        // run: min-of-2 then measures the steady per-query cost a service
        // pays, not a leaked-cache warm path that grows without bound.
        Caching.release()
        t
      }
      name -> times.min
    }).toMap
    val qs = results.map { case (k, v) =>
      // failed queries get a negative sentinel so the JSON can't read green
      val t = if (failed.contains(k)) -v else v
      s"\"" + k + "\":" + t
    }.mkString("{", ",", "}")
    val errs = failed.distinct.map(n => s"\"$n\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // A filtered (partial) run is marked in the JSON so it can never be
    // mistaken for a full-run BENCH.json.
    val onlyKey = only.map(s =>
      s""","only":${s.toSeq.sorted.map(n => s"\"$n\"").mkString("[", ",", "]")}""").getOrElse("")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"runs_per_query":$runsPerQuery,"sf":"$sfDir"$onlyKey}"""
    println(json)
    // Also persist the line: the driver captures stdout's TAIL, which has
    // truncated past rounds' leading queries — the file can't be.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")),
        (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] write: $e") }
    spark.stop()
  }
}
