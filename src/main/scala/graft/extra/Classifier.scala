package graft.extra

import graft.Caching
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Learned quality filter — the CCNet / GPT-3 / LLaMA recipe: train a cheap
  * linear text classifier to separate a REFERENCE corpus (Wikipedia-like
  * sources) from raw crawl, then keep crawl documents the classifier scores
  * reference-like. fastText with an SGD loop is the usual tool; the
  * closed-form equivalent a Spark pipeline can train in ONE aggregate pass
  * is multinomial Naive Bayes — per-term add-1-smoothed log-odds
  *
  *   lodds(t) = log (c⁺(t)+1)/(N⁺+V)  −  log (c⁻(t)+1)/(N⁻+V)
  *
  * and a document score Σ tf(t)·lodds(t) + log-prior-odds, which is exactly
  * a linear model over the bag-of-words (an NB-weighted fastText without
  * the softmax). No iterations, no learning rate, deterministic.
  *
  * Float discipline (the [[TextStats]] LM convention): each log is
  * 6-decimal-pinned before the subtraction, the subtraction of two pinned
  * doubles is IEEE-exact in any engine, and per-term contributions round to
  * integer MICROS before the summation-order-free per-document integer sum.
  * The mean-free total stays far under 2^53 at any document length.
  *
  * Scale shape (100 TB): one pinned (doc_id, y, term, tf) aggregate feeds
  * model, priors and scoring; the model table is vocabulary-sized (≪ corpus)
  * so the score join is a broadcast; everything else is map-side-combined
  * aggregates. Training and scoring together are two corpus passes (one
  * tokenize+aggregate, one score join) — the same budget as tf-idf.
  *
  * Reference anchor: the reference has no learned filter; its nearest
  * analogue is the hand-written readability gate
  * (`ingest/profiling/filters.py:44` is_csv_readable). This is the learned
  * generalization a training-data pipeline substitutes once labels exist.
  */
object Classifier {

  private def toks(c: Column): Column =
    graft.functions.TextTokens.lowerSpaceTokens(c)

  /** The label rule normalized: NULL evaluations (e.g. a NULL source
    * against an isin whitelist) count as NEGATIVE, matching the oracle's
    * CASE ... ELSE 0 — without this, NULL labels silently drop out of the
    * class totals and the two engines diverge on NULL-bearing corpora.
    */
  private def yOf(positive: Column): Column =
    coalesce(positive.cast("int"), lit(0))

  /** Pinned (doc_id, y, term, tf) — the single corpus pass everything else
    * reads. `positive` is any boolean Column over the input row (the label
    * rule, e.g. a reference-source whitelist).
    */
  private def docTermTf(docs: DataFrame, idCol: String, textCol: String,
                        positive: Column): DataFrame =
    Caching.temp(
      docs.select(col(idCol).as("doc_id"), yOf(positive).as("y"),
          explode(toks(col(textCol))).as("term"))
        .groupBy("doc_id", "y", "term").agg(count(lit(1)).as("tf")))

  /** 6-decimal-pinned add-1 log-likelihood ratio per term, from a
    * (term, c_pos, c_neg) × (n_pos, n_neg, v) frame.
    */
  private def loddsCol: Column =
    round(
      round(log((col("c_pos") + lit(1)).cast("double") /
        (col("n_pos") + col("v")).cast("double")), 6) -
      round(log((col("c_neg") + lit(1)).cast("double") /
        (col("n_neg") + col("v")).cast("double")), 6), 6)

  private def modelOf(tf: DataFrame): DataFrame = {
    val byTerm = tf.groupBy("term").agg(
      sum(when(col("y") === 1, col("tf")).otherwise(lit(0L))).as("c_pos"),
      sum(when(col("y") === 0, col("tf")).otherwise(lit(0L))).as("c_neg"))
    val totals = byTerm.agg(sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
      count(lit(1)).as("v"))
    byTerm.crossJoin(broadcast(totals))
      .withColumn("lodds", loddsCol)
      .select("term", "c_pos", "c_neg", "lodds")
  }

  /** Session cache for trained NB models — the model is a reusable
    * artifact like the BPE merge table or the sketch index: four serving
    * queries (scores, eval, calibration, the model dump itself) otherwise
    * each repeat the training aggregation. Keyed by (applicationId, caller
    * key); stores the vocabulary-sized model as a PERSISTED, materialized
    * DataFrame (executor-resident — at web-crawl vocabulary the model is
    * gigabytes and must never round-trip through the driver as Scala
    * objects; the score join broadcasts it executor-to-executor) + the one
    * collected scalar, the prior micros.
    */
  private val modelCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (DataFrame, Long)]
  private val modelLocks = scala.collection.concurrent.TrieMap
    .empty[(String, String), Object]

  /** Drop memoized models whose caller key starts with `cacheKeyPrefix` —
    * the bench uses this so a `train_nb` line times a TRUE retrain.
    */
  def resetModels(spark: org.apache.spark.sql.SparkSession,
                  cacheKeyPrefix: String): Unit = {
    val appId = spark.sparkContext.applicationId
    modelCache.keys.filter(k => k._1 == appId && k._2.startsWith(cacheKeyPrefix))
      .foreach(modelCache.remove(_).foreach { case (df, _) =>
        df.unpersist(blocking = false)
      })
  }

  /** Train (or fetch the memoized) model frame + prior for `cacheKey`. */
  def trainedModel(docs: DataFrame, idCol: String, textCol: String,
                   positive: Column, cacheKey: String): (DataFrame, Long) = {
    val k = (docs.sparkSession.sparkContext.applicationId, cacheKey)
    // first train under the per-key lock (graft.Caching.memoLocked): racing
    // first builds would each run the corpus-sized train and leak the
    // losers' persisted model blocks until GC
    graft.Caching.memoLocked(modelCache, modelLocks, k) {
      val model = modelOf(docTermTf(docs, idCol, textCol, positive)).persist()
      model.count() // materialize under the tf pin, before release()
      val prior = priorMicroOf(docs, positive)
      graft.Caching.release()
      (model, prior)
    }
  }

  /** The trained model artifact: one row per vocabulary term with its class
    * counts and pinned log-odds weight — what a serving layer broadcasts.
    * With `cacheKey` the model comes from the session memo (trained at most
    * once per key — the bpeTrain convention); values are identical either
    * way (spec-locked).
    */
  def nbModel(docs: DataFrame, idCol: String, textCol: String,
              positive: Column, cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case None => modelOf(docTermTf(docs, idCol, textCol, positive))
      case Some(k) => trainedModel(docs, idCol, textCol, positive, k)._1
    }

  /** Per-document scores: integer-micro Σ tf·lodds plus the add-1 log-prior
    * odds. Empty documents score the prior alone (the model has no opinion).
    *
    * @return (doc_id, label, n_toks, nb_score, pred_hq) — label is the
    *         training label (kept for audit), pred_hq = score > 0
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              positive: Column, cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case None => nbScoreTrain(docs, idCol, textCol, positive)
      case Some(k) =>
        // serving composition over the memoized artifact — identical values
        // (scoreWith ≡ nbScore is spec-locked)
        val (model, prior) = trainedModel(docs, idCol, textCol, positive, k)
        scoreWith(docs, idCol, textCol, model, prior)
          .join(docs.select(col(idCol).as("doc_id"),
            yOf(positive).cast("long").as("label")), "doc_id")
          .select("doc_id", "label", "n_toks", "nb_score", "pred_hq")
    }

  private def nbScoreTrain(docs: DataFrame, idCol: String, textCol: String,
                           positive: Column): DataFrame = {
    val tf = docTermTf(docs, idCol, textCol, positive)
    val model = modelOf(tf)
    // add-1 prior from DOCUMENT counts, same pinning as the term weights
    val prior = docs.agg(
      sum(yOf(positive).cast("long")).as("d_pos"),
      sum((lit(1) - yOf(positive)).cast("long")).as("d_neg"))
      .withColumn("prior_micro", round(
        (round(log((col("d_pos") + lit(1)).cast("double") /
          (col("d_pos") + col("d_neg") + lit(2)).cast("double")), 6) -
         round(log((col("d_neg") + lit(1)).cast("double") /
          (col("d_pos") + col("d_neg") + lit(2)).cast("double")), 6)) * 1e6)
        .cast("long"))
      .select("prior_micro")
    val perDoc = tf.join(broadcast(model), "term")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_toks"),
        sum(round(col("tf") * col("lodds") * 1e6).cast("long")).as("lo_micro"))
    docs.select(col(idCol).as("doc_id"), yOf(positive).cast("long").as("label"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .withColumn("score_micro",
        coalesce(col("lo_micro"), lit(0L)) + col("prior_micro"))
      .select(col("doc_id"), col("label"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (col("score_micro").cast("double") / 1e6).as("nb_score"),
        (col("score_micro") > 0).cast("long").as("pred_hq"))
  }

  /** The add-1 doc-prior log-odds in integer micros, collected once — the
    * scalar a serving layer ships beside the model table.
    */
  def priorMicroOf(docs: DataFrame, positive: Column): Long =
    docs.agg(
      sum(yOf(positive).cast("long")).as("d_pos"),
      sum((lit(1) - yOf(positive)).cast("long")).as("d_neg"))
      .select(round(
        (round(log((col("d_pos") + lit(1)).cast("double") /
          (col("d_pos") + col("d_neg") + lit(2)).cast("double")), 6) -
         round(log((col("d_neg") + lit(1)).cast("double") /
          (col("d_pos") + col("d_neg") + lit(2)).cast("double")), 6)) * 1e6)
        .cast("long"))
      .collect()(0).getLong(0)

  /** Score documents with an ALREADY-TRAINED model — the serving form: no
    * training pass, no labels, one broadcast join of the vocabulary-sized
    * model onto the batch's tf table. Same integer-micro arithmetic as
    * [[nbScore]] (identical scores on identical inputs — spec-locked);
    * terms outside the model vocabulary contribute zero evidence.
    *
    * @return (doc_id, n_toks, nb_score, pred_hq)
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame, priorMicro: Long): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val perDoc = tf.join(broadcast(model.select("term", "lodds")), "term")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_toks"),
        sum(round(col("tf") * col("lodds") * 1e6).cast("long")).as("lo_micro"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("score_micro",
        coalesce(col("lo_micro"), lit(0L)) + lit(priorMicro))
      .select(col("doc_id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        (col("score_micro").cast("double") / 1e6).as("nb_score"),
        (col("score_micro") > 0).cast("long").as("pred_hq"))
  }

  /** Calibration (reliability) report of the classifier scores: fixed-width
    * bins over the observed score range, per-bin document count, positive
    * count and positive rate — the plot a gate owner reads to pick the
    * decision threshold (a well-calibrated filter's positive rate rises
    * monotonically with the score).
    *
    * All-integer binning: the range comes from a 1-row broadcast of
    * (min, max) score micros (the zorder range-bucket pattern), bin =
    * ((s − mn)·bins) DIV (mx − mn + 1) — no global sort, no quantile
    * estimate, engine-exact at any scale. `round(nb_score·1e6)` recovers
    * the exact integer micros the score was built from.
    *
    * @return (bin, n_docs, n_pos, score_lo, score_hi, pos_rate_ppm) — at
    *         most `bins` rows
    */
  def nbCalibration(docs: DataFrame, idCol: String, textCol: String,
                    positive: Column, bins: Int = 10,
                    cacheKey: Option[String] = None): DataFrame = {
    val s = nbScore(docs, idCol, textCol, positive, cacheKey)
      .withColumn("sm", round(col("nb_score") * 1e6).cast("long"))
    val range = s.agg(min("sm").as("mn"), max("sm").as("mx"))
    s.crossJoin(broadcast(range))
      .withColumn("bin", expr(s"((sm - mn) * $bins) DIV (mx - mn + 1)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("label").as("n_pos"),
        (min("sm").cast("double") / 1e6).as("score_lo"),
        (max("sm").cast("double") / 1e6).as("score_hi"))
      .withColumn("pos_rate_ppm", expr("(n_pos * 1000000) DIV n_docs"))
  }

  /** Train-set confusion rollup — the one-row audit a gate owner reads
    * before trusting the filter: counts per (label, prediction) cell plus
    * micro-pinned accuracy.
    *
    * @return (tp, fp, fn, tn, accuracy) single row
    */
  def nbEval(docs: DataFrame, idCol: String, textCol: String,
             positive: Column, cacheKey: Option[String] = None): DataFrame =
    nbScore(docs, idCol, textCol, positive, cacheKey).agg(
      sum(when(col("label") === 1 && col("pred_hq") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("label") === 0 && col("pred_hq") === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col("label") === 1 && col("pred_hq") === 0, 1L).otherwise(0L)).as("fn"),
      sum(when(col("label") === 0 && col("pred_hq") === 0, 1L).otherwise(0L)).as("tn"))
      .withColumn("accuracy",
        expr("CAST(((tp + tn) * 1000000) DIV (tp + fp + fn + tn) AS DOUBLE)") / 1e6)
}
