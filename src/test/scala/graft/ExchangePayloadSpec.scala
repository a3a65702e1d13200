package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Durable form of the round-13 exchange-payload audit: the text-heavy
  * operators were rewritten so corpus-sized payloads (document text, chunk
  * text, raw media bytes) never travel through a shuffle — grams/units are
  * in-row projections, verdicts return as int index lists, rebuilds are
  * per-row slice-gathers. That property held only by one-off audit tooling;
  * this spec walks each flagship query's physical plan and asserts no
  * ShuffleExchange output carries a payload column, so a regression (e.g.
  * someone "simplifying" a unit-hash pass back to exploding text rows)
  * fails CI instead of quietly re-inflating shuffle volume at lake scale.
  *
  * Broadcast exchanges are exempt: broadcasting is small-by-definition
  * (query rows, 1-row scalars), and several serving paths legitimately
  * broadcast titles/snippets.
  */
class ExchangePayloadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Payload columns that must never be shuffle-exchange outputs. */
  private val PayloadCols = Set("text", "chunk_text", "media")

  private def shuffledPayloadCols(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def root(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    root(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeExec =>
        s.output.map(_.name.toLowerCase)
          .filter(n => PayloadCols.contains(n))
    }.flatten
  }

  // the corpus-shaped queries whose r13/r14 rewrites this locks: gram and
  // unit families, the TF/LM/passage artifact consumers, fingerprints,
  // the curation ladder, and the media family (payload = binary media)
  private val Flagships = Seq(
    "corpus_build", "corpus_build2", "corpus_select",
    "dedup_paragraph", "dedup_lines", "dedup_spans",
    "dedup_jaccard", "dedup_minhash", "dedup_shingle", "dedup_exact",
    "dedup_substrings", "dedup_substrings_self", "decontaminate_spans",
    "rep_metrics", "rep_crossdoc", "doc_fingerprint", "doc_chunks",
    "lm_quality", "lm_quality2", "dsir_weights", "passage_search",
    "tf_topk_docs", "tfidf_topk_docs", "bm25_docs",
    "dedup_media", "dedup_media_clusters", "quality_gate", "gopher_rules")

  test("the walker sees shuffles (canary): a text-repartition plan is flagged") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val bad = docs.repartition(col("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"), max("text").as("t"))
    assert(shuffledPayloadCols(bad).contains("text"),
      "walker failed to see the text column in a shuffle exchange — " +
        "the payload assertions below would be vacuous")
  }

  test("no shuffle exchange carries a corpus payload column (text, " +
    "chunk_text, media) in any flagship text/media query plan") {
    val dir = SparkTestSession.sf0001
    val offenders = Flagships.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val bad = shuffledPayloadCols(df).distinct
      graft.Caching.release()
      if (bad.nonEmpty) Seq(s"$name shuffles ${bad.mkString(",")}") else Nil
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
