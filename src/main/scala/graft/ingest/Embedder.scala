package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding mean-pooling — danae pools GloVe vectors of a column's top
  * terms into one sketch vector (reference: search/word_aggregator.py:13-24:
  * sum of known-term vectors divided by the FULL term count, OOV included).
  *
  * Two implementations:
  *  - [[meanPoolLong]]: posexplode + avg, long format — SQL-expressible, used
  *    by the DuckDB oracle gate.
  *  - [[VectorMean]]: a typed `Aggregator` that sums fixed-width vectors in a
  *    single pass without exploding — at 100 TB the explode multiplies the
  *    shuffle by the vector width (64×), the Aggregator keeps one buffer per
  *    group and combines map-side.
  */
object Embedder {

  /** Mean vector per group in long format (group, dim, v). `dim` is 1-based
    * to match DuckDB's list indexing in the oracle.
    */
  def meanPoolLong(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("dim0", "v")))
      .groupBy(col("grp"), (col("dim0") + 1).as("dim"))
      .agg(round(avg(col("v").cast("double")), 6).as("v"))

  /** Single-pass mean of `Array[Double]` vectors (element-wise). Divides by
    * the row count like word_aggregator.py:24 divides by len(terms).
    */
  case class VBuf(sum: Array[Double], n: Long)

  class VectorMean(dim: Int) extends Aggregator[Array[Double], VBuf, Array[Double]] {
    def zero: VBuf = VBuf(new Array[Double](dim), 0L)
    def reduce(b: VBuf, a: Array[Double]): VBuf = {
      if (a != null) {
        var i = 0
        while (i < dim && i < a.length) { b.sum(i) += a(i); i += 1 }
        VBuf(b.sum, b.n + 1)
      } else b
    }
    def merge(x: VBuf, y: VBuf): VBuf = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      VBuf(x.sum, x.n + y.n)
    }
    def finish(b: VBuf): Array[Double] =
      if (b.n == 0) b.sum else b.sum.map(_ / b.n)
    def bufferEncoder: org.apache.spark.sql.Encoder[VBuf] = Encoders.product[VBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Mean vector per group as array<double> (Aggregator path). */
  def meanPoolVec(df: DataFrame, groupCol: String, vecCol: String, dim: Int): DataFrame = {
    val agg = udaf(new VectorMean(dim))
    df.groupBy(col(groupCol))
      .agg(agg(col(vecCol).cast("array<double>")).as("mean_vec"))
  }

  /** Deterministic term → embedding-row mapping used to stand in for the
    * GloVe table (word_aggregator.py:5-11) with the fixture `embeddings`
    * table: md5-derived hash of the term modulo table size. md5 (not
    * murmur3) so any engine reproduces the mapping bit for bit — the DuckDB
    * oracle twin of the categorical sketch computes the same vec_id with
    * `('0x'||substring(md5('tv:'||term),1,8))::BIGINT % n` (same trick as
    * DistanceJoin.rUnit / Dedup's MinHash perms).
    */
  def termVectors(terms: DataFrame, embeddings: DataFrame, termCol: String): DataFrame = {
    // table size as a broadcast 1-row join — keeps the whole pipeline lazy
    val nDf = embeddings.agg((max("vec_id") + 1).as("n_vecs"))
    terms.crossJoin(broadcast(nDf))
      .withColumn("vec_id",
        (conv(substring(md5(concat(lit("tv:"), col(termCol))), 1, 8), 16, 10)
          .cast("long") % col("n_vecs")).cast("long"))
      .drop("n_vecs")
      .join(broadcast(embeddings.select(col("vec_id"), col("embedding"))), "vec_id")
  }

  /** GloVe text-format loader — the ingestion path for a REAL word-embedding
    * file (`word v1 v2 ... vd` per line, space-separated), the format
    * word_aggregator.py:5-11 reads into its dict. One distributed text scan;
    * the vocabulary table that comes out is small relative to any corpus and
    * broadcastable into every pooling join.
    * Returns (term, embedding array<double>); malformed/empty lines dropped.
    */
  def loadGlove(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), " +").as("parts"))
      .filter(size(col("parts")) >= 2)
      // try_cast, not cast: malformed vector entries must yield null (and
      // drop the line below), not fail the whole load under ANSI mode
      .select(
        element_at(col("parts"), 1).as("term"),
        expr("transform(slice(parts, 2, size(parts) - 1), x -> try_cast(x AS double))")
          .as("embedding"))
      .filter(!array_contains(transform(col("embedding"), _.isNull), true))

  /** Mean-pool a group's terms against a real vocabulary with the
    * reference's OOV semantics (word_aggregator.py:13-24): SUM over known
    * vectors, but divide by the FULL term count — out-of-vocabulary terms
    * count in the denominator as zero vectors. Left-join + coalesce keeps
    * it one broadcast join + one aggregation.
    */
  def meanPoolGlove(terms: DataFrame, vocab: DataFrame, groupCol: String,
                    termCol: String, dim: Int): DataFrame = {
    val zero = array_repeat(lit(0.0), dim)
    val joined = terms
      .join(broadcast(vocab.select(col("term").as("__vocab_term"),
        col("embedding").as("__vocab_vec"))),
        col(termCol) === col("__vocab_term"), "left")
      .withColumn("vec", coalesce(col("__vocab_vec"), zero))
    meanPoolVec(joined, groupCol, "vec", dim)
  }
}
