package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/bandwidth path for
  * billion-vector corpora: symmetric per-vector scaling to [-127, 127]
  * cuts an embedding store 4× (float32 → int8) and keeps cosine ranking
  * nearly intact; ANN candidate generation runs on int8, exact re-scoring
  * on the float originals. All pure column expressions
  * (aggregate/transform over the array — codegen'd, shuffle-free).
  */
object Quantize {

  /** Per-vector symmetric scale: max|v| / 127, floored away from zero so a
    * null-ish all-zero vector quantizes to zeros instead of dividing by 0.
    */
  def scaleOf(vec: Column): Column =
    greatest(aggregate(vec, lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0,
      lit(1e-12))

  /** Quantize to int8 range: round(v / scale) clamped to [-127, 127]. */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      least(greatest(round(x / scale), lit(-127.0)), lit(127.0)).cast("int"))

  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Quantization audit over an embeddings table: per vector, the scale,
    * integer checksums of the quantized codes (sum / sum-of-squares — exact
    * cross-engine equality over every code), and the fidelity metrics a
    * pipeline gates on (max absolute dequantization error; cosine between
    * original and dequantized, which bounds the ANN ranking drift).
    *
    * @return (vec_id, scale_r, q_sum, q_sumsq, max_err_r, cos_r)
    */
  def audit(emb: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), _.cast("double"))
    val df = emb.select(col(idCol), v.as("vec"))
      .withColumn("scale", scaleOf(col("vec")))
      .withColumn("q", quantize(col("vec"), col("scale")))
      .withColumn("deq", dequantize(col("q"), col("scale")))
    df.select(col(idCol),
      round(col("scale"), 9).as("scale_r"),
      aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
      aggregate(col("q"), lit(0L), (a, x) => a + x * x).as("q_sumsq"),
      round(aggregate(zip_with(col("vec"), col("deq"), (a, b) => abs(a - b)),
        lit(0.0), (a, x) => greatest(a, x)), 9).as("max_err_r"),
      round(graft.functions.VectorOps.cosine(col("vec"), col("deq")), 6)
        .as("cos_r"))
  }
}
