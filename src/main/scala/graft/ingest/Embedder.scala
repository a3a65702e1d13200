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
    * table: murmur3 hash of the term modulo table size.
    */
  def termVectors(terms: DataFrame, embeddings: DataFrame, termCol: String): DataFrame = {
    // table size as a broadcast 1-row join — keeps the whole pipeline lazy
    val nDf = embeddings.agg((max("vec_id") + 1).as("n_vecs"))
    terms.crossJoin(broadcast(nDf))
      .withColumn("vec_id", pmod(hash(col(termCol)), col("n_vecs")).cast("long"))
      .drop("n_vecs")
      .join(broadcast(embeddings.select(col("vec_id"), col("embedding"))), "vec_id")
  }
}
