package graft.search

import graft.ingest.TermStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text scoring — the Spark replacement for danae's ES/Lucene
  * metadata search (search/metadata_search.py:12-46: bool/should `match` over
  * metadata fields with per-field boosts, minimum_should_match=1, top-M,
  * normalized by the max score).
  *
  * Implemented as plain aggregations + column expressions: document length
  * and term frequencies are one tokenize+aggregate pass, document frequencies
  * one (term)-keyed aggregate broadcast back. k1=1.2, b=0.75 (Lucene
  * defaults); idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene BM25 idf).
  * All corpus stats are lazily joined (no driver actions); at 100 TB the
  * per-term df table is vocabulary-sized and broadcastable.
  */
object Bm25 {

  /** BM25 scores of `queryTerms` against one text column. Returns
    * (doc_id, score) for docs matching ≥ 1 term, scores rounded to 6.
    */
  def scores(docs: DataFrame, docIdCol: String, textCol: String,
             queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TermStats.tokens(docs, docIdCol, textCol)
    val tf = TermStats.termFreqs(toks)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.filter(col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.filter(col("term").isin(queryTerms: _*))
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("term_score",
        col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum("term_score"), 6).as("score"))
  }

  /** Autocomplete (ui/methods.py:21-42's multi_match + top-10): case-folded
    * substring match over title+description, deterministic order, limit n.
    */
  def autocomplete(meta: DataFrame, kwd: String, n: Int = 10): DataFrame =
    meta.filter(lower(concat_ws(" ", col("title"), col("description")))
        .contains(kwd.toLowerCase))
      .select(col("dataset_id"), col("title"))
      .orderBy(col("title").asc, col("dataset_id").asc)
      .limit(n)

  /** Title-only search (ui/methods.py:44-69: `match metadata.title`). */
  def titleSearch(meta: DataFrame, terms: Seq[String], topM: Int = 10): DataFrame =
    scores(meta.select(col("dataset_id").as("doc_id"), col("title")),
      "doc_id", "title", terms)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topM)

  /** Multi-field BM25 with per-field boosts, normalized by the max combined
    * score to [0,1] (metadata_search.py:37-46) — keeps per-field score
    * columns in place of ES explain-parsing (metadata_search.py:48-63).
    * fields: (columnName, boost). Returns (doc_id, <field>_score..., score).
    */
  def multiField(docs: DataFrame, docIdCol: String,
                 fields: Seq[(String, Double)], queryTerms: Seq[String],
                 topM: Int = 100): DataFrame = {
    val perField = fields.map { case (f, boost) =>
      scores(docs, docIdCol, f, queryTerms)
        .select(col("doc_id"), (col("score") * boost).as(s"${f}_score"))
    }
    val combined = perField.reduce(_.join(_, Seq("doc_id"), "full_outer"))
      .na.fill(0.0)
    val total = fields.map { case (f, _) => col(s"${f}_score") }.reduce(_ + _)
    val withTotal = combined.withColumn("raw", total)
    val maxDf = withTotal.agg(max("raw").as("max_raw"))
    withTotal.crossJoin(broadcast(maxDf))
      .withColumn("score", round(col("raw") / col("max_raw"), 6))
      .drop("raw", "max_raw")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topM)
  }
}
