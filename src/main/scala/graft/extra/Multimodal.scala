package graft.extra

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators. (LLM-pipeline extras per BASELINE.json; not in
  * the danae reference surface.)
  *
  * The Spark-side plumbing — schema, batched per-partition execution,
  * deterministic output shape — is real and tested. The DECODE STEP IS A
  * STUB: this container has no image/audio codecs, so `decodeStub` derives
  * deterministic pseudo-features from the raw bytes. Swapping in a real
  * decoder (JavaCV, TwelveMonkeys, a Python `mapInPandas` worker, …) changes
  * ONLY the body of `decodeStub`; every plan shape stays identical.
  *
  * Scale notes: all operators are per-row/per-partition (no shuffle); media
  * bytes never leave the executor that read them, and feature extraction is
  * batched per partition exactly like an Arrow-batched pandas UDF would be.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Synthesize a media table from the documents fixture: text bytes stand in
    * for an encoded payload; metadata is derived deterministically.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      struct(
        (pmod(col("doc_id"), lit(8)) * 64 + 256).cast("int").as("width"),
        (pmod(col("doc_id"), lit(6)) * 64 + 256).cast("int").as("height"),
        (length(col("text")) * 40L).cast("long").as("duration_ms"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: deterministic pseudo-features from raw bytes (rolling
    * byte statistics per stripe). Replace with a real codec to productionize.
    */
  private[extra] def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return new Array[Float](dim)
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      out(d) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val stripe = math.max(1, bytes.length / dim)
    var d = 0
    while (d < dim) { out(d) = out(d) / stripe; d += 1 }
    out
  }

  /** Batched per-partition feature extraction — the Scala analogue of an
    * Arrow-batched `mapInPandas` UDF: one iterator pass per partition, media
    * column in, fixed-width `array<float>` out.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = true),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("doc_id", "media_type", "media")
      .mapPartitions { it =>
        it.map { r =>
          val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1), decodeStub(bytes, dim).toSeq)
        }
      }(enc)
  }

  /** Frame sampling for video/audio rows: one output row per sampled offset,
    * with the (stub-)sliced payload. Pure generate — no shuffle.
    */
  def frameSample(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .filter(col("media_type").isin("video", "audio"))
      .filter(col("meta.duration_ms") > 0) // sequence() rejects 0 → -1 ranges
      .select(col("doc_id"), col("media_type"), col("media"),
        col("meta.duration_ms").as("duration_ms"))
      .withColumn("offset_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_idx", (col("offset_ms") / everyMs).cast("int"))
      // stub slice: 32 payload bytes at the proportional position
      .withColumn("frame",
        expr("substring(media, cast(offset_ms * length(media) / greatest(duration_ms, 1) as int) + 1, 32)"))
      .select("doc_id", "media_type", "frame_idx", "offset_ms", "frame")

  /** Metadata-only resize: recompute target dimensions, payload untouched
    * (a real resize happens inside the decode worker).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")))
    media.withColumn("meta", struct(
      ceil(col("meta.width") * scale).cast("int").as("width"),
      ceil(col("meta.height") * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.n_bytes").as("n_bytes")))
  }
}
