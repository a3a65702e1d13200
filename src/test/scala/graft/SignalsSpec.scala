package graft

import graft.extra.Signals
import org.scalatest.funsuite.AnyFunSuite

/** The fixture corpus is single-line word-soup, so the oracle query
  * (gopher_rules / char_entropy / token_fertility / vocab_growth) never
  * exercises the line-based rules — these specs plant synthetic documents
  * with bullets, ellipses and newlines and hand-compute the expected rule
  * values and entropy micronats.
  */
class SignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gopherRow(text: String): org.apache.spark.sql.Row = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    Signals.gopherRules(df, "doc_id", "text").collect().head
  }

  test("gopherRules: a clean long document keeps") {
    // 50 words incl. stopwords, mean word length in [3,10]
    val text = (Seq.fill(24)("the quick") :+ "dogs jump").mkString(" ")
    val r = gopherRow(text)
    assert(r.getAs[Long]("n_words") == 50L)
    assert(r.getAs[Long]("stopword_hits") == 24L)
    assert(r.getAs[Double]("frac_alpha_words") == 1.0)
    assert(r.getAs[Int]("keep") == 1)
  }

  test("gopherRules: short doc, bullet lines and symbol ratio each reject") {
    assert(gopherRow("the cat sat").getAs[Int]("keep") == 0, "too few words")

    // all lines bullets → frac_bullet_lines = 1.0 > 0.9 rejects even when
    // the word count passes
    val bullets = Seq.fill(25)("- the item listed here").mkString("\n")
    val b = gopherRow(bullets)
    assert(b.getAs[Double]("frac_bullet_lines") == 1.0)
    assert(b.getAs[Long]("n_words") >= 50L)
    assert(b.getAs[Int]("keep") == 0)

    // '#'-dense text → symbol_word_ratio > 0.1 rejects
    val hashy = (Seq.fill(25)("the word## here##")).mkString(" ")
    val h = gopherRow(hashy)
    assert(h.getAs[Double]("symbol_word_ratio") > 0.1)
    assert(h.getAs[Int]("keep") == 0)

    // ellipsis-terminated lines beyond 0.3 reject
    val ell = (Seq.fill(10)("the line trails off...") ++
      Seq("the line stays")).mkString("\n")
    val e = gopherRow(ell)
    assert(e.getAs[Double]("frac_ellipsis_lines") > 0.3)
    assert(e.getAs[Int]("keep") == 0)
  }

  test("gopherRules: empty doc gets NULL ratios and keep 0") {
    val r = gopherRow("")
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_word_len")))
    assert(r.getAs[Int]("keep") == 0)
  }

  test("charEntropy: single-symbol text is 0; 'ab' is 2*round half-micros of ln 2") {
    val df = Seq((1L, "aaaa"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val got = Signals.charEntropy(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(1L).contains(0L), "p=1 → ln 1 = 0 → zero entropy")
    // each symbol: p=.5, round(ln .5, 6) = -0.693147;
    // term = round(0.5 * 0.693147 * 1e6) = round(346573.5) = 346574
    assert(got(2L).contains(693148L))
    assert(got(3L).isEmpty, "empty doc → NULL entropy")
  }

  test("charEntropy orders texts by diversity") {
    val df = Seq(
      (1L, "aaaaaaaaaaaaaaaa"),
      (2L, "the cat sat on the mat"),
      (3L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val e = Signals.charEntropy(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(e(1L) < e(2L) && e(2L) < e(3L))
  }

  test("tokenFertility: punctuation-heavy language pays more tokens per word") {
    val df = Seq(
      ("aa", "the plain words here"),
      ("bb", "the plain, words; here!")).toDF("lang", "text")
    val got = Signals.tokenFertility(df, "lang", "text").collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(got("aa").getAs[Long]("n_words") == 4L)
    assert(got("aa").getAs[Long]("n_tokens") == 4L)
    assert(got("aa").getAs[Double]("fertility") == 1.0)
    // "the plain , words ; here !" → 7 word/punct tokens over 4 words
    assert(got("bb").getAs[Long]("n_tokens") == 7L)
    assert(got("bb").getAs[Double]("fertility") == 1.75)
  }

  test("langConfusion: counts per declared/predicted cell, shares sum to 1") {
    val df = Seq(
      (1L, "the cat and the dog", "en"),   // en markers → pred en
      (2L, "der hund ist nicht da", "en"), // de markers under an en label
      (3L, "el que la de y los", "es")     // es markers → pred es
    ).toDF("doc_id", "text", "lang")
    val got = Signals.langConfusion(df, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("en", "en")) == ((1L, 0.5)))
    assert(got(("en", "de")) == ((1L, 0.5)), "mislabeled doc lands off-diagonal")
    assert(got(("es", "es")) == ((1L, 1.0)))
    assert(got.size == 3)
  }

  test("aggregate signals are partitioning-invariant (1 vs 7 partitions)") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(key(Signals.tokenFertility(docs, "lang", "text")) ==
      key(Signals.tokenFertility(docs.repartition(7), "lang", "text")))
    assert(key(Signals.vocabGrowth(docs, "source", "text")) ==
      key(Signals.vocabGrowth(docs.repartition(7), "source", "text")))
    assert(key(Signals.langConfusion(docs, "doc_id", "text")) ==
      key(Signals.langConfusion(docs.repartition(7), "doc_id", "text")))
  }

  test("vocabGrowth: hapax tail and type/token ratio per source") {
    val df = Seq(
      ("s1", "the the the cat"),
      ("s1", "the dog"),
      ("s2", "all words differ here")).toDF("source", "text")
    val got = Signals.vocabGrowth(df, "source", "text").collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // s1: tokens=6 {the:4, cat:1, dog:1} → vocab 3, hapax 2, ttr 0.5
    assert(got("s1").getAs[Long]("n_tokens") == 6L)
    assert(got("s1").getAs[Long]("vocab_size") == 3L)
    assert(got("s1").getAs[Long]("hapax_count") == 2L)
    assert(got("s1").getAs[Double]("ttr") == 0.5)
    // s2: every word a hapax → ttr 1.0
    assert(got("s2").getAs[Long]("hapax_count") == 4L)
    assert(got("s2").getAs[Double]("ttr") == 1.0)
  }

  // ---------------------------------------------------------------------
  // blocklist (Aho-Corasick gate)
  // ---------------------------------------------------------------------

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("blocklist: hand-checked hits, distinct semantics, prefix terms, keep") {
    val terms = Seq("merge", "merge batch", "ba", "zz top")
    val df = Seq(
      (1L, "one merge batch then another merge here"), // merge, merge batch, ba
      (2L, "nothing of note"),                         // no hits
      (3L, "ba bab ba"),                               // ba once despite 3 occurrences
      (4L, "MERGE Batch upper-cased")                  // case-insensitive
    ).toDF("doc_id", "text")
    val got = rowsOf(Signals.blocklist(df, "doc_id", "text", terms))
    assert(got == Seq((1L, 3L, 0L), (2L, 0L, 1L), (3L, 1L, 0L), (4L, 3L, 0L)))
  }

  test("blocklist: AC pass ≡ per-term contains composition — random docs, " +
    "overlapping/prefix/multibyte terms, 0/1/multi-partition") {
    val terms = Seq("ab", "aba", "ba b", "é中", "Éb", "zz")
    val rnd = new scala.util.Random(4242)
    val alphabet = "ab éB中 "
    val docs = (0L until 300L).map { i =>
      (i, (0 until rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    val ac = rowsOf(Signals.blocklist(df.repartition(5), "doc_id", "text", terms))
    val naive = rowsOf(Signals.blocklistNaive(df, "doc_id", "text", terms))
    assert(ac == naive)
    // the random corpus must actually exercise the matcher
    assert(ac.map(_._2).sum > 0, "fixture produced zero hits — widen it")
    assert(ac.exists(_._3 == 1L), "fixture produced zero keeps — widen it")
  }

  test("blocklist: null text row yields null hits row; empty terms keep all") {
    val df = Seq((1L, "some text"), (2L, null)).toDF("doc_id", "text")
    val got = Signals.blocklist(df, "doc_id", "text", Seq("zz"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, false), (2L, true)))
    val all = rowsOf(Signals.blocklist(
      Seq((1L, "anything")).toDF("doc_id", "text"), "doc_id", "text", Nil))
    assert(all == Seq((1L, 0L, 1L)))
  }

  test("blocklist: NULL text and empty-terms rows agree across all three " +
    "implementations (AC operator, naive twin, DuckDB SQL twin)") {
    // ADVICE r16: the twins read a NULL row as (0 hits, keep = 1) while the
    // AC operator yields (NULL, keep = 0) — latent until a NULL-bearing
    // corpus. All three must now agree row for row.
    val df = Seq((1L, "merge batch here"), (2L, null), (3L, "clean row"))
      .toDF("doc_id", "text")
    val terms = Seq("merge", "zz top")
    def shape(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val ac = shape(Signals.blocklist(df, "doc_id", "text", terms))
    val nv = shape(Signals.blocklistNaive(df, "doc_id", "text", terms))
    assert(ac == nv, s"AC $ac vs naive $nv")
    assert(ac == Seq((1L, 1L, 0L), (2L, -1L, 0L), (3L, 0L, 1L)))
    // the SQL twin replicates the same NULL propagation: run it through
    // Spark SQL (position/lower/CASE semantics shared with DuckDB)
    df.createOrReplaceTempView("bl_null_docs")
    val sql = shape(spark.sql(
      Signals.blocklistSqlFor("bl_null_docs", "doc_id", "text", terms)))
    assert(sql == ac, s"SQL twin $sql vs AC $ac")
    // empty-terms SQL must be valid and keep NULL-propagation semantics
    val sqlEmpty = shape(spark.sql(
      Signals.blocklistSqlFor("bl_null_docs", "doc_id", "text", Nil)))
    assert(sqlEmpty == Seq((1L, 0L, 1L), (2L, -1L, 0L), (3L, 0L, 1L)))
  }
}
