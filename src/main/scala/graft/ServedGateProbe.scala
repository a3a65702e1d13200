package graft

import graft.search.Bm25
import org.apache.spark.sql.functions._

/** Crossover probe for the served-BM25 stats budget
  * (`spark.graft.metaStats.maxServedDlEntries` — VERDICT r15 What's
  * wrong #1): A/B of [[Bm25.multiFieldServed]] (per-request
  * [[graft.functions.LiteralMapLookup]] hash tables built and shipped
  * with the plan — O(1) probes, O(dl entries) build/ship; the original
  * map-LITERAL form it replaced scanned keys linearly per row and lost
  * 16.6× at 300k entries) vs
  * [[Bm25.multiFieldWithStats]] (LocalRelation broadcast hash joins —
  * O(matching rows) lookups plus a few extra driver round-trips for the
  * broadcast-build jobs) on a SYNTHETIC catalogue of N datasets × 3
  * fields, every dataset matching ~1 query term per field (the shape a
  * real request sees: qtf rows ∝ datasets matching the query text).
  *
  * Usage: runMain graft.ServedGateProbe [Ns...]  (default 1k 3k 10k 30k 100k)
  * Prints one line per N with min-of-runs wall for each path; the
  * crossover N sets the conf default (PLANS.md round-16 records the
  * measurement).
  */
object ServedGateProbe {
  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1000, 3000, 10000, 30000, 100000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("servedgateprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val fieldNames = Seq("title", "keywords", "description")
    val terms = (0 until 5).map(i => s"term$i")
    val fields = fieldNames.map(f => (f, 1.0 / 3, terms))

    for (n <- ns) {
      // synthetic stats: N datasets × 3 fields; dl 10..59; every term
      // matches ~N/5 datasets per field (df), every dataset matches ONE
      // term per field in qtf (tf 1..3) — matching rows = 3N
      val dl = for (d <- 0 until n; f <- fieldNames)
        yield (s"ds$d", f, 10L + d % 50)
      val corpus = fieldNames.map { f =>
        (f, n.toLong, dl.filter(_._2 == f).map(_._3).sum.toDouble / n) }
      val dfreq = for (f <- fieldNames; t <- terms)
        yield (f, t, math.max(1L, n.toLong / terms.size))
      val qtfRows = for (d <- 0 until n; f <- fieldNames)
        yield (s"ds$d", f, terms(d % terms.size), 1L + d % 3)
      // distributed qtf (the real path reads the pinned TF artifact, not a
      // LocalRelation — repartition so the scan parallelizes like it)
      val qtf = qtfRows.toDF("doc_id", "field", "term", "tf")
        .repartition(32).cache()
      qtf.count()

      def timeMin(runs: Int)(f: => Unit): Double =
        (0 until runs).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val served = timeMin(3) {
        Bm25.multiFieldServed(qtf, dl, corpus, dfreq, fields).collect() }
      val viaDf = timeMin(3) {
        Bm25.multiFieldWithStats(qtf,
          dl.toDF("doc_id", "field", "dl"),
          corpus.toDF("field", "n_docs", "avgdl"),
          dfreq.toDF("field", "term", "df"), fields).collect() }
      println(f"== N=$n%7d dlEntries=${3 * n}%7d qtfRows=${3 * n}%7d " +
        f"served=$served%8.3fs dfBroadcast=$viaDf%8.3fs " +
        f"ratio=${served / viaDf}%6.2f")
      qtf.unpersist()
    }
    spark.stop()
  }
}
