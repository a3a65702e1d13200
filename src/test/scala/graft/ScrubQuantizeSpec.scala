package graft

import graft.extra.{Quantize, TextScrub}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScrubQuantizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scrub redacts urls, emails and ips in order and counts each") {
    val docs = Seq(
      (1L, "mail a@b.com then visit https://x.org/path?u=c@d.io end"),
      (2L, "server at 192.168.0.1 and 10.0.0.2"),
      (3L, "nothing sensitive here"),
      (4L, "version 1.2.3.4.5 is not an ip boundary case 999.1.1.1 is"),
      (5L, "Mail John.Doe@Example.COM or see HTTPS://Internal.Site now")
    ).toDF("doc_id", "text")
    val got = TextScrub.scrub(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // url swallowed the embedded c@d.io (redaction order), leaving one email
    assert(got(1L) == ((1L, 1L, 0L)))
    assert(got(2L) == ((0L, 0L, 2L)))
    assert(got(3L) == ((0L, 0L, 0L)))
    // 1.2.3.4.5: the \b-bounded pattern matches its 1.2.3.4 prefix; 999.x
    // matches too ({1,3} digits, no range check) — documented laxity
    assert(got(4L)._3 == 2L)
    // case-insensitive: uppercase emails/URLs must not escape redaction
    assert(got(5L) == ((1L, 1L, 0L)))
    val s = docs.filter($"doc_id" === 1L)
      .select(TextScrub.scrubbed($"text")).head().getString(0)
    assert(s == "mail <EMAIL> then visit <URL> end")
  }

  test("int8-rerank ANN: exact sims on returned pairs, high recall vs brute force") {
    import graft.extra.EmbeddingKnn
    val emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = EmbeddingKnn.bruteForce(emb, qs, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val int8 = EmbeddingKnn.int8Rerank(emb, qs, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(int8.size == brute.size)
    // the rerank is EXACT cosine, so overlapping pairs score identically
    int8.keySet.intersect(brute.keySet).foreach(k => assert(int8(k) == brute(k)))
    val recall = int8.keySet.intersect(brute.keySet).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("quantize round-trips within one scale step and clips at 127") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.001f, 0.002f, -0.003f, 0.004f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = Quantize.audit(vecs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // max dequantization error is bounded by scale/2 for unclipped values
    Seq(1L, 2L).foreach { id =>
      val scale = rows(id).getAs[Double]("scale_r")
      assert(rows(id).getAs[Double]("max_err_r") <= scale / 2 + 1e-12)
      assert(rows(id).getAs[Double]("cos_r") > 0.999)
    }
    // the max-|v| element always quantizes to exactly ±127
    val q = vecs.filter($"vec_id" === 1L)
      .select(Quantize.quantize(
        transform($"embedding", _.cast("double")),
        Quantize.scaleOf(transform($"embedding", _.cast("double")))))
      .head().getSeq[Int](0)
    assert(q == Seq(64, -127, 32, 0))
    // all-zero vector: zero codes, no NaN/∞ from the scale floor
    assert(rows(3L).getAs[Long]("q_sum") == 0L)
    assert(rows(3L).getAs[Double]("max_err_r") == 0.0)
  }
}
