package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-signal operators for web-scale pretraining curation, alongside
  * [[TextStats]]: the named Gopher repetition/format heuristics (Rae et al.
  * 2021, "Scaling Language Models: ... Gopher", table A1), a character-level
  * entropy score (the cheap compressibility proxy — boilerplate and
  * key-mash both sit far from natural-language entropy), per-language
  * tokenizer fertility (the multilingual tokenizer-budget diagnostic), and
  * per-source vocabulary growth (type/token ratio + hapax mass, the
  * Heaps'-law signals that separate template spam from organic text).
  *
  * All per-document operators are pure column expressions — whole-stage
  * codegen, zero shuffle, linear in corpus bytes, so they ride the first
  * scan over a 100 TB corpus. The two corpus-level reports aggregate with
  * map-side partials to a handful of rows. Float discipline follows
  * [[TextStats.lmScore]]: every `ln` is pinned to 6 decimals before any
  * multiply (collapsing JVM/libm last-ulp differences onto one double) and
  * entropy crosses the engine boundary as an integer-micronat sum, which is
  * summation-order-free by construction.
  *
  * Reference anchor: the reference's only ingest-time quality gate is
  * `is_csv_readable` (`ingest/profiling/filters.py:44`) — it rejects files
  * whose head looks like an HTML doctype or a JSON-shaped header rather
  * than tabular data; these operators are the corpus-curation
  * generalizations of that "is this content what it claims to be" idea.
  */
object Signals {

  private def words(c: Column): Column =
    graft.functions.TextTokens.lowerSpaceTokens(c)

  /** Occurrences of literal character `ch` in `t` via length difference —
    * `translate` is a codegen string op, no regex engine in the hot loop
    * (mirrors the oracle's `replace(…, ch, '')`).
    */
  private def charCount(t: Column, ch: String): Column =
    length(t) - length(translate(t, ch, ""))

  // ---------------------------------------------------------------------
  // Gopher quality rules
  // ---------------------------------------------------------------------

  /** Gopher rule bounds (word count, mean word length, symbol-to-word
    * ratio, bullet-line / ellipsis-line fractions, alphabetic-word
    * fraction, minimum stopword hits) — public constants from Rae et al.
    * 2021 appendix A1.1, also adopted by RefinedWeb / Dolma / FineWeb.
    */
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolWordRatio = 0.1
  val MaxBulletLineFrac = 0.9
  val MaxEllipsisLineFrac = 0.3
  val MinAlphaWordFrac = 0.8
  val MinStopwordHits = 2L

  /** Per-document Gopher rule columns + the conjunction keep flag.
    * Differs from [[TextStats.stats]]'s scalar quality score: these are the
    * NAMED, individually-auditable rules a curation pipeline reports per
    * document (which rule rejected how much of which source), not a single
    * composite. `keep` is int 0/1 so the cross-engine hash compare never
    * depends on boolean rendering.
    *
    * @param passthrough input columns appended verbatim to the output
    *        (e.g. a precomputed entropy column on the streaming gate path)
    * @return (doc_id, n_words, mean_word_len, symbol_word_ratio,
    *         frac_bullet_lines, frac_ellipsis_lines, frac_alpha_words,
    *         stopword_hits, keep [, passthrough...])
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  passthrough: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val w = words(t)
    val nWords = size(w).cast("long")
    // word chars = all non-space chars of the document (words are the
    // space-split tokens, so their summed length is exactly this)
    val wordChars = length(regexp_replace(lower(t), " ", ""))
    val meanLen = when(nWords > 0,
      round(wordChars.cast("double") / nWords, 6))
    // Gopher counts '#' and '…'/'...' as the symbol set
    val symbols = charCount(t, "#") + regexp_count(t, lit("\\.\\.\\."))
    val symRatio = when(nWords > 0,
      round(symbols.cast("double") / nWords, 6))
    val lines = split(t, "\n")
    val nLines = size(lines)
    val bulletFrac = round(size(filter(lines,
      l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines, 6)
    val ellipsisFrac = round(size(filter(lines,
      l => l.rlike("\\.\\.\\.\\s*$"))).cast("double") / nLines, 6)
    val alphaFrac = when(nWords > 0,
      round(size(filter(w, x => x.rlike("[a-z]"))).cast("double") / nWords, 6))
    val stopHits = size(filter(w,
      x => x.isin(TextStats.stopwords: _*))).cast("long")
    val keep =
      nWords.between(MinWords, MaxWords) &&
        meanLen.between(MinMeanWordLen, MaxMeanWordLen) &&
        (symRatio <= MaxSymbolWordRatio) &&
        (bulletFrac <= MaxBulletLineFrac) &&
        (ellipsisFrac <= MaxEllipsisLineFrac) &&
        (alphaFrac >= MinAlphaWordFrac) &&
        (stopHits >= MinStopwordHits)
    df.select(Seq(
      col(idCol).as("doc_id"),
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"),
      bulletFrac.as("frac_bullet_lines"),
      ellipsisFrac.as("frac_ellipsis_lines"),
      alphaFrac.as("frac_alpha_words"),
      stopHits.as("stopword_hits"),
      coalesce(keep, lit(false)).cast("int").as("keep")) ++
      passthrough.map(col): _*)
  }

  // ---------------------------------------------------------------------
  // Character entropy
  // ---------------------------------------------------------------------

  /** The counted alphabet: a–z, 0–9, space; everything else lands in one
    * "other" bucket. Fixed and public so the oracle SQL enumerates the
    * identical terms.
    */
  val entropyAlphabet: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString) :+ " "

  /** Character-unigram Shannon entropy per document, in integer micronats
    * (∑ −p·ln p over the 37-symbol alphabet + other bucket, each term
    * micro-rounded after a 6-decimal-pinned ln). Natural text sits ~2.4–3.0
    * nats; `aaaa…` ~0; uniform noise ~3.6. A pure expression tree (38
    * length-diff counts + fixed-order integer sum) — no explode, no
    * shuffle, no map state; the integer term sum is deterministic under any
    * partitioning and the fixed term order makes it engine-exact.
    *
    * @return (doc_id, n_chars, entropy_micro) — NULL entropy for empty docs
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val total = length(t)
    // one-pass native codegen expression (functions/TextOps.scala) — the
    // Column-tree formulations were measured at ~4s/run (38 inline terms:
    // pure analyzer/optimizer cost on a ~150-node tree) and ~0.6 ms/row
    // (array + higher-order aggregate: ArrayAggregate is CodegenFallback);
    // the expression does the whole alphabet in one compiled string pass
    // with bit-identical BigDecimal rounding.
    val entropy = graft.functions.TextEntropy.charEntropyMicro(t)
    df.select(
      col(idCol).as("doc_id"),
      total.cast("long").as("n_chars"),
      when(total > 0, entropy).as("entropy_micro"))
  }

  /** DuckDB twin of [[charEntropy]]'s per-symbol term, kept beside the
    * Scala so the 38 terms can never drift: the oracle SQL is generated
    * from the same alphabet constant.
    */
  def charEntropySqlFor(table: String, idCol: String, textCol: String): String = {
    def cnt(chSql: String) =
      s"(length(lower($textCol)) - length(replace(lower($textCol), $chSql, '')))"
    def term(c: String) =
      s"""CASE WHEN $c > 0 THEN CAST(round(-(CAST($c AS DOUBLE)/length(lower($textCol)))
         | * round(ln(CAST($c AS DOUBLE)/length(lower($textCol))), 6) * 1e6) AS BIGINT)
         | ELSE 0 END""".stripMargin.replace("\n", " ")
    val terms = entropyAlphabet.map(ch =>
      term(cnt(s"'${if (ch == "'") "''" else ch}'"))) :+
      term(s"length(regexp_replace(lower($textCol), '[a-z0-9 ]', '', 'g'))")
    s"""SELECT $idCol AS doc_id,
       | CAST(length(lower($textCol)) AS BIGINT) AS n_chars,
       | CASE WHEN length($textCol) > 0 THEN ${terms.mkString("\n  + ")}
       | ELSE NULL END AS entropy_micro
       |FROM $table""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Tokenizer fertility
  // ---------------------------------------------------------------------

  /** Per-language tokenizer fertility report: how many subword-ish tokens
    * (the BPE-ish word/punct regex of [[TextStats.tokenCounts]]) the corpus
    * spends per whitespace word and per character, by language. THE
    * multilingual budget diagnostic — a language with fertility ≫ corpus
    * median is under-served by the tokenizer and silently pays more
    * sequence length per sentence. One map-side-combined aggregate to
    * |languages| rows.
    *
    * @return (lang, n_docs, n_words, n_tokens, n_chars, fertility,
    *         tokens_per_char) sorted by lang
    */
  def tokenFertility(df: DataFrame, langCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
        col(langCol).as("lang"),
        size(words(t)).cast("long").as("w"),
        regexp_count(lower(t), lit("[a-z0-9]+|[^a-z0-9\\s]")).cast("long").as("tk"),
        length(t).cast("long").as("ch"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("w").as("n_words"),
        sum("tk").as("n_tokens"),
        sum("ch").as("n_chars"))
      .withColumn("fertility", when(col("n_words") > 0,
        round(col("n_tokens").cast("double") / col("n_words"), 6)))
      .withColumn("tokens_per_char", when(col("n_chars") > 0,
        round(col("n_tokens").cast("double") / col("n_chars"), 6)))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------------
  // Language confusion
  // ---------------------------------------------------------------------

  /** Declared-vs-predicted language confusion matrix — the corpus-QA
    * report that catches mislabeled sources before they skew a mixture:
    * counts per (declared, predicted) cell from [[TextStats.langId]], with
    * each cell's share of its declared language. The matrix is
    * |langs|² rows, so the share window is bounded however large the
    * corpus; everything before it is one map-side-combined aggregate over
    * the per-row language scorer.
    *
    * @return (lang, lang_pred, n, share) sorted by (lang, lang_pred)
    */
  def langConfusion(df: DataFrame, idCol: String, textCol: String,
                    langCol: String = "lang"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    TextStats.langId(df, idCol, textCol).select(col("doc_id"), col("lang_pred"))
      .join(df.select(col(idCol).as("doc_id"), col(langCol).as("lang")), "doc_id")
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n").cast("double") / sum("n").over(w), 6))
      .orderBy("lang", "lang_pred")
  }

  // ---------------------------------------------------------------------
  // Vocabulary growth
  // ---------------------------------------------------------------------

  /** Per-source vocabulary report: token total, vocabulary size, hapax
    * count (words seen once — organic text keeps a fat hapax tail; template
    * spam has almost none) and type/token ratio. Two map-side-combined
    * aggregates — (source, word) counts, then per-source rollup; the
    * integer counts make every derived ratio engine-exact.
    *
    * @return (source, n_tokens, vocab_size, hapax_count, ttr) by source
    */
  def vocabGrowth(df: DataFrame, groupCol: String, textCol: String): DataFrame =
    df.select(col(groupCol).as("source"),
        explode(words(col(textCol))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(
        sum("cnt").as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_count"))
      .withColumn("ttr", when(col("n_tokens") > 0,
        round(col("vocab_size").cast("double") / col("n_tokens"), 6)))
      .orderBy("source")

  // ---------------------------------------------------------------------
  // Blocklist filter (C4-style banned word/phrase gate)
  // ---------------------------------------------------------------------

  /** Per-document blocklist gate: how many DISTINCT blocklist terms occur
    * as case-insensitive substrings, and the keep flag (no hits). The C4
    * "contains a banned word" rule (Raffel et al. 2020 §2.2) generalized
    * to phrases.
    *
    * Scale path: ONE Aho–Corasick pass per document
    * ([[graft.functions.AcAutomaton]]) — O(bytes + matches) per row,
    * independent of blocklist size; the automaton ships with the plan, so
    * the whole gate is a shuffle-free column expression riding the first
    * corpus scan. The naive per-term `contains` composition
    * ([[blocklistNaive]]) is O(terms × bytes) per row — kept as the
    * property twin and the A/B baseline, never the default.
    *
    * @return (doc_id, n_terms_hit, keep) — BIGINTs for engine-exact compare
    */
  def blocklist(df: DataFrame, idCol: String, textCol: String,
                terms: Seq[String]): DataFrame = {
    val hits = graft.functions.Blocklist.hits(col(textCol), terms)
    df.select(col(idCol),
      hits.cast("long").as("n_terms_hit"),
      when(hits === 0, 1L).otherwise(0L).as("keep"))
  }

  /** O(terms × bytes) relational twin of [[blocklist]] — per-term
    * `Contains` scans; value-identical by the case-fold argument in
    * [[graft.functions.AcAutomaton]]'s scaladoc (locked in SignalsSpec).
    * The sum tree is BALANCED: a left-fold `reduce(_ + _)` nests `Add`
    * 1-per-term deep and overflows the analyzer stack near ~1k terms
    * (measured: StackOverflowError in ColumnNodeToExpressionConverter at
    * 1024 terms) — a second, independent way the per-term composition
    * fails to scale with blocklist size.
    */
  def blocklistNaive(df: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String]): DataFrame = {
    def bal(xs: Seq[Column]): Column =
      if (xs.sizeIs == 1) xs.head
      else { val (a, b) = xs.splitAt(xs.size / 2); bal(a) + bal(b) }
    val sum =
      if (terms.isEmpty) lit(0L)
      else bal(terms.map(t =>
        when(lower(col(textCol))
            .contains(lit(graft.functions.Blocklist.fold(t))), 1L)
          .otherwise(0L)))
    // NULL text propagates (ADVICE r16): the AC operator yields
    // (n_terms_hit = NULL, keep = 0) for a NULL row — the bare
    // when/otherwise sum would read it as 0 hits and KEEP it, silently
    // diverging from the operator this twin exists to certify.
    val hits = when(col(textCol).isNull, lit(null).cast("long"))
      .otherwise(sum)
    df.select(col(idCol),
      hits.as("n_terms_hit"),
      when(hits === 0, 1L).otherwise(0L).as("keep"))
  }

  /** DuckDB twin of [[blocklist]]: `position(term IN lower(text))` per
    * term — an engine-independent statement of the same distinct-term
    * presence semantics.
    */
  def blocklistSqlFor(table: String, idCol: String, textCol: String,
                      terms: Seq[String]): String = {
    def esc(t: String) =
      graft.functions.Blocklist.fold(t).replace("'", "''")
    // empty term list emits a literal 0 (ADVICE r16): mkString over Nil
    // produced 'CAST( AS BIGINT)' — invalid SQL — while the Scala side
    // explicitly supports Nil ("empty terms keep all")
    val hit =
      if (terms.isEmpty) "0"
      else terms
        .map(t => s"(CASE WHEN position('${esc(t)}' IN lower($textCol)) > 0 THEN 1 ELSE 0 END)")
        .mkString(" + ")
    // NULL text propagates like the AC operator (NULL hits, keep = 0) —
    // see blocklistNaive
    s"""SELECT $idCol,
       |  CAST(CASE WHEN $textCol IS NULL THEN NULL ELSE $hit END AS BIGINT) AS n_terms_hit,
       |  CAST(CASE WHEN $textCol IS NULL THEN 0
       |            WHEN $hit = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM $table""".stripMargin
  }
}
