package graft.streaming

import graft.extra.TextStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming corpus ingestion operators — the Structured Streaming twins of
  * the batch curation pipeline, for lakes where documents arrive
  * continuously rather than as a static table.
  */
object CorpusStream {

  /** Streaming exact dedup: normalize-fingerprint each arriving document and
    * keep only the first occurrence per fingerprint —
    * `dropDuplicatesWithinWatermark`, so the dedup state is EVICTED once the
    * watermark passes (bounded state on an unbounded stream; duplicates are
    * guaranteed caught within the horizon, the right trade for a corpus
    * ingest that sees its duplicates in bursts). The streaming twin of
    * CorpusPipeline's fingerprint-dedup stage.
    */
  def dedupStream(spark: SparkSession, dir: String, schema: StructType,
                  textCol: String = "text", tsCol: String = "ts",
                  horizon: String = "1 hour"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("fingerprint", TextStats.fingerprintCol(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming dedup against the HISTORICAL corpus — the other half of
    * streaming dedup: [[dedupStream]] catches duplicates within the stream's
    * watermark horizon; this drops arrivals whose fingerprint already exists
    * in the accumulated corpus. A stream-static LEFT ANTI join: Structured
    * Streaming re-plans the static side per micro-batch, so a corpus
    * fingerprint table maintained by the batch pipeline (one slim column —
    * broadcastable far past what raw documents would be) is picked up as it
    * grows, with zero streaming state. Compose after [[dedupStream]] for
    * exactly-once-per-corpus semantics across both horizons.
    */
  def dedupAgainstCorpus(stream: DataFrame, corpusFingerprints: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val withFp =
      if (stream.columns.contains("fingerprint")) stream
      else stream.withColumn("fingerprint", TextStats.fingerprintCol(col(textCol)))
    withFp.join(broadcast(corpusFingerprints.select("fingerprint")),
      Seq("fingerprint"), "left_anti")
  }
}
