package graft

import graft.ingest.Embedder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("meanPoolLong on orthogonal unit vectors gives exact fractions") {
    // FIXTURES.md §B.4: orthogonal vectors → exact fractional means
    val df = Seq(
      ("g", Seq(1.0f, 0.0f)), ("g", Seq(0.0f, 1.0f)),
      ("h", Seq(1.0f, 0.0f))).toDF("grp", "vec")
    val got = Embedder.meanPoolLong(df, "grp", "vec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == Set(("g", 1, 0.5), ("g", 2, 0.5), ("h", 1, 1.0), ("h", 2, 0.0)))
  }

  test("GloVe text loader + OOV-aware pooling (word_aggregator.py semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("glove")
    val f = dir.resolve("vectors.txt")
    java.nio.file.Files.write(f,
      "apple 1.0 0.0\nbanana 0.0 1.0\ncherry 0.5 0.5\n\nbroken x y\n"
        .getBytes("UTF-8"))
    val vocab = Embedder.loadGlove(spark, f.toString)
    val rows = vocab.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(rows.keySet == Set("apple", "banana", "cherry"),
      "malformed and empty lines must be dropped")
    assert(rows("apple") == Seq(1.0, 0.0))

    // doc terms: apple, banana, durian (OOV). The reference sums KNOWN
    // vectors but divides by the FULL term count -> (1/3, 1/3), not (1/2, 1/2).
    val terms = Seq(("d1", "apple"), ("d1", "banana"), ("d1", "durian"))
      .toDF("doc_id", "term")
    val pooled = Embedder.meanPoolGlove(terms, vocab, "doc_id", "term", 2)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(pooled("d1").map(v => math.abs(v - 1.0 / 3) < 1e-9) == Seq(true, true))
  }

  test("VectorMean aggregator matches posexplode+avg on real embeddings") {
    val emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
    val viaAgg = Embedder.meanPoolVec(
        emb.withColumn("vec", transform(col("embedding"), _.cast("double"))),
        "label", "vec", 64)
      .select(col("label"), posexplode(col("mean_vec")).as(Seq("d0", "v")))
      .select(col("label"), (col("d0") + 1).as("dim"), round(col("v"), 6).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaExplode = Embedder.meanPoolLong(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (k, v) => assert(math.abs(v - viaExplode(k)) < 1e-6, s"$k") }
  }
}
