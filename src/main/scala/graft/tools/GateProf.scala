package graft.tools

import org.apache.spark.sql.functions.col

/** Per-family cost isolator for the streaming admission gate: drains the
  * same 1,000-doc file stream through admitStreamMaintained with the
  * maintenance families enabled one at a time, so the probe/TF/pairs/gram
  * shares of the per-batch cost are visible; then drains the SAME 1,000
  * docs as 1/2/4 micro-batches with the full family to show the fixed
  * per-batch cost amortizing with batch size. Usage:
  * runMain graft.tools.GateProf [sfDir] [nBatches]
  */
object GateProf {
  /** Sample EVERY live thread's top frames for ~secs (RUNNABLE only),
    * bucketing janino/codegen, JIT-adjacent, Spark task and driver work —
    * unlike Prof.sampler this sees compilation threads, not just
    * executor tasks.
    */
  private def allThreadSampler(secs: Int, top: Int = 12): Thread = {
    import scala.jdk.CollectionConverters._
    val t = new Thread(() => {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      (1 to secs * 10).foreach { _ =>
        Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
          if (th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
            th.getName != "gateprof-sampler") {
            val hot = s"[${th.getName.take(24)}] ${st.take(3).mkString(" <- ")}"
            counts(hot) = counts.getOrElse(hot, 0) + 1
          }
        }
        Thread.sleep(100)
      }
      counts.toSeq.sortBy(-_._2).take(top).foreach { case (f, c) =>
        println(s"== HOT[$c] $f") }
    }, "gateprof-sampler")
    t.setDaemon(true); t.start(); t
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 4
    // incoming-doc count (default the bench's 1,000): the amortization
    // claim needs a LARGE single batch too — run at sf1.0 with 10000 to
    // measure the per-doc cost when the fixed per-batch cost is split
    // over 10× the docs (VERDICT r14 next #3)
    val nDocs = if (args.length > 2) args(2).toLong else 1000L
    val spark = Prof.session("gateprof")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val seed = docs.filter(col("doc_id") < 300)
      .filter(graft.extra.CorpusOps.sampleBucket(col("doc_id")) < 80)
      .select("doc_id", "text")
    val incoming = docs
      .filter(col("doc_id") >= 300 && col("doc_id") < 300 + nDocs)
      .select("doc_id", "text")
    val staged = scala.collection.mutable.Buffer.empty[String]
    def stage(n: Int): String = {
      val d = java.nio.file.Files.createTempDirectory(s"gateprof$n").toString
      staged += d
      (0 until n).foreach { i =>
        incoming.filter(col("doc_id") % n === i)
          .coalesce(1).write.mode("append").parquet(d)
      }
      d
    }
    val dir = stage(nBatches)
    val base = s"$sfDir#gateprof"
    def reset(): Unit = {
      graft.extra.Dedup.resetIndex(spark, base)
      graft.extra.Dedup.resetPairs(spark, base)
      graft.ingest.TermStats.resetTermFreqs(spark, base)
    }
    def drain(label: String, tf: Boolean, pairs: Boolean,
              gram: Boolean, streamDir: String = dir): Unit = {
      reset()
      graft.extra.Dedup.trainedIndex(seed, "doc_id", "text", s"$base:idx")
      if (gram) graft.extra.Dedup.trainedGramIndex(
        seed, "doc_id", "text", s"$base:gram", 20)
      if (tf) {
        graft.ingest.TermStats.trainedTermFreqs(
          seed, "doc_id", "text", s"$base:tf")
        graft.ingest.TermStats.trainedTermFreqs(
          seed, "doc_id", "text", s"$base:tf2", n = 2)
      }
      if (pairs) graft.extra.Dedup.trainedPairs(
        seed, "doc_id", "text", 0.95, s"$base:pairs")
      Prof.time(label) {
        val stream = spark.readStream.schema(incoming.schema)
          .option("maxFilesPerTrigger", "1").parquet(streamDir)
        val q = graft.streaming.CorpusStream.admitStreamMaintained(
          stream, seed, s"$base:idx", threshold = 0.95,
          tfCacheKeys =
            if (tf) Seq(s"$base:tf", s"$base:tf2") else Nil,
          pairsSpecs =
            if (pairs) Seq((s"$base:pairs", 0.95, false)) else Nil,
          gramSpecs = if (gram) Seq((s"$base:gram", 20)) else Nil) {
          (_, _) => ()
        }
        try q.processAllAvailable() finally q.stop()
      }
      graft.Caching.release()
    }
    drain("warmup (full)", tf = true, pairs = true, gram = true)
    if (args.length <= 2) {
      drain("probe only", tf = false, pairs = false, gram = false)
      drain("probe+tf", tf = true, pairs = false, gram = false)
      drain("probe+pairs", tf = false, pairs = true, gram = false)
      drain("probe+gram", tf = false, pairs = false, gram = true)
      drain("full", tf = true, pairs = true, gram = true)
    }
    // amortization sweep: same docs, full family, varying batch count —
    // under the default batch conf AND the small-static-partition ingest
    // conf (the stack-sampled hotspot is shuffle-FILE creation from
    // hundreds of tiny 32-partition map tasks per micro-batch). A
    // non-default nDocs runs the ingest-conf single-batch point only (the
    // large-batch amortization probe).
    val sweep =
      if (args.length <= 2) Seq((false, 1), (false, 2), (false, 4),
        (true, 1), (true, 2), (true, 4))
      else Seq((true, 1))
    for ((ingestConf, n) <- sweep) {
      if (ingestConf) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
      } else {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      val tag = if (ingestConf) " ingest-conf" else ""
      val d = stage(n)
      drain(s"full n=$n$tag (a)", tf = true, pairs = true, gram = true,
        streamDir = d)
      // GRAFT_SAMPLE=1: stack-sample ALL threads during the (b) drain, to
      // attribute the per-batch fixed cpu (task work vs codegen/JIT vs
      // driver planning)
      val smp = if (sys.env.contains("GRAFT_SAMPLE"))
        Some(allThreadSampler(20)) else None
      drain(s"full n=$n$tag (b)", tf = true, pairs = true, gram = true,
        streamDir = d)
      smp.foreach(_.join(3000))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    reset()
    // reclaim the staged micro-batch dirs (one per sweep point)
    staged.foreach { d =>
      def rec(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rec); f.delete(); ()
      }
      try rec(new java.io.File(d)) catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
