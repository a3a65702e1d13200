package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis operators for training-data curation: token counting,
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting. All pure column expressions (whole-stage codegen; no
  * UDFs) — per-row work, no shuffle at all, so they scale linearly with
  * input and can be pushed into the first pass over a 100 TB corpus.
  * Formulas are deliberately written with primitives that DuckDB evaluates
  * identically (string_split/list_filter/length arithmetic) so every one of
  * them is oracle-checkable.
  */
object TextStats {

  private def toks(c: Column): Column =
    filter(split(lower(c), " "), t => t =!= "")

  /** Per-document statistics + a composite quality score. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val tokens = toks(t)
    val nChars = length(t)
    val nTokens = size(tokens)
    // alphanumeric+space chars removed = punctuation/other (over the
    // lowercased text — the oracle lowercases too)
    val punct = length(regexp_replace(lower(t), "[a-z0-9 ]", ""))
    val stop = size(filter(tokens, x => x.isin(stopwords: _*)))
    // Degenerate documents (empty / whitespace-only) get NULL ratios on BOTH
    // sides: Spark and DuckDB disagree on float x/0 (null vs inf/NaN), so the
    // guards here pair with NULLIF/CASE in the oracle SQL.
    df.select(
      col(idCol).as("doc_id"),
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      when(nTokens > 0, round(nChars.cast("double") / nTokens, 6))
        .as("chars_per_token"),
      when(nChars > 0, round(punct.cast("double") / nChars, 6)).as("punct_ratio"),
      when(nTokens > 0, round(stop.cast("double") / nTokens, 6))
        .as("stopword_ratio"),
      // quality: enough tokens × low punctuation share
      when(nChars > 0,
        round(least(nTokens.cast("double") / 100.0, lit(1.0))
          * (lit(1.0) - least(punct.cast("double") / nChars, lit(1.0))), 6))
        .as("quality"))
  }

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Marker-word vocabularies for the n-gram/stopword language-ID heuristic.
    * Deterministic scoring: count of marker hits per language, argmax with
    * alphabetical tie-break, "und" (undetermined) when no marker hits.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai"))

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = toks(col(textCol))
    val scored = langMarkers.foldLeft(
      df.select(col(idCol).as("doc_id"), tokens.as("tokens"))) {
      case (acc, (lang, markers)) =>
        acc.withColumn(s"score_$lang",
          size(filter(col("tokens"), t => t.isin(markers: _*))))
    }
    val best = langMarkers.map { case (lang, _) => col(s"score_$lang") }
      .reduce((a, b) => greatest(a, b))
    // argmax with alphabetical tie-break: first lang reaching the max wins
    val pick = langMarkers.foldRight(lit("und")) { case ((lang, _), els) =>
      when(col(s"score_$lang") === col("best") && col("best") > 0, lit(lang))
        .otherwise(els)
    }
    // foldRight gives de-first precedence; evaluate in alphabetical order
    val outCols = col("doc_id") +:
      (langMarkers.map { case (l, _) => col(s"score_$l").cast("long").as(s"score_$l") }
        :+ col("lang_pred"))
    scored.withColumn("best", best)
      .withColumn("lang_pred", pick)
      .select(outCols: _*)
  }

  /** Token counting the ways an LLM-pipeline budgeter needs it: whitespace
    * tokens, word/punctuation splits (a BPE-ish regex — every alphanumeric
    * run and every punctuation mark is a token candidate), and the chars/4
    * rule-of-thumb BPE estimate. Pure codegen expressions, shuffle-free.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol).as("doc_id"),
      length(t).cast("long").as("n_chars"),
      size(toks(t)).cast("long").as("n_ws_tokens"),
      regexp_count(lower(t), lit("[a-z0-9]+|[^a-z0-9\\s]")).cast("long")
        .as("n_word_punct"),
      ceil(length(t).cast("double") / 4.0).cast("long").as("n_bpe_est"))
  }

  /** The normalize-and-hash fingerprint COLUMN (shared by the batch
    * fingerprint table and the streaming dedup).
    */
  def fingerprintCol(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""),
      " +", " ")))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text with
    * non-alphanumerics stripped — stable under formatting jitter; the
    * building block for fuzzy exact-dedup.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), fingerprintCol(col(textCol)).as("fingerprint"))
}
