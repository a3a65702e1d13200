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
