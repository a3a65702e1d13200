package graft

import graft.extra.TextStats
import org.scalatest.funsuite.AnyFunSuite

/** TextStats is mostly oracle-covered (text_stats, lang_id, token_counts,
  * doc_fingerprint, lm_quality, bpe_pairs); these specs pin the semantics
  * that are easiest to regress silently — LM score ordering and the BPE
  * pair-count arithmetic — on hand-checkable fixtures.
  */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lmScore: common-token docs outscore rare-token docs; empty doc is NULL") {
    val docs = Seq(
      (1L, "the the the the"),       // only common tokens
      (2L, "the zyxwv"),             // one rare token drags the mean down
      (3L, "")                       // no tokens → NULL score
    ).toDF("doc_id", "text")
    val got = TextStats.lmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tokens"),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1L)._1 == 4L && got(2L)._1 == 2L && got(3L)._1 == 0L)
    assert(got(3L)._2.isEmpty, "empty doc must have NULL lm_logprob")
    assert(got(1L)._2.get > got(2L)._2.get,
      "common-token doc must have higher (less negative) mean logprob")
    // hand-check doc 1: vocab = {the: 5, zyxwv: 1}, N=6, V=2
    // lp(the) = ln((5+1)/(6+2)); doc mean = round(round(4*lp, 4)/4, 6)
    val lpSum = BigDecimal(4 * math.log(6.0 / 8.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = BigDecimal(lpSum / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L)._2.get - expected) < 1e-9)
  }

  test("bpePairs: weighted adjacent-pair counts with deterministic ranks") {
    // "abab" x3 + "ab" x2: pairs per 'abab' = ab, ba, ab; per 'ab' = ab
    // → ab occurrences 3*2+2 = 8 (2 distinct words), ba occurrences 3 (1 word)
    val docs = Seq(
      (1L, "abab abab ab"),
      (2L, "abab ab"),
      (3L, "x")                      // 1-char word contributes nothing
    ).toDF("doc_id", "text")
    val got = TextStats.bpePairs(docs, "text").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_occurrences"), r.getAs[Int]("rank")))).toMap
    assert(got("ab") == ((2L, 8L, 1)))
    assert(got("ba") == ((1L, 3L, 2)))
    assert(got.size == 2)
  }
}
