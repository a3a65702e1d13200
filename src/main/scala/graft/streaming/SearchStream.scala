package graft.streaming

import graft.search.CombinedScorer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming similarity-search serving — the Structured Streaming twin of
  * danae's interactive search endpoint (ui/ui.py routes one HTTP request to
  * search/combined_search.py per call): requests arrive as a stream, answers
  * are appended to a sink, and every answer comes from the SAME batch engine
  * the rest of the library uses.
  *
  * Shape: `foreachBatch` — the idiomatic Spark way to serve a batch pipeline
  * over a request stream. Per micro-batch the static side (the pinned sketch
  * index, the metadata corpus) is re-resolved, so an index swap by
  * [[graft.search.Sketches.refreshDataset]] becomes visible to the next
  * batch with no twin code to keep in sync. The driver loop is over
  * REQUESTS, not data: a micro-batch holds an interactive trickle of query
  * ids (each answered by a fully distributed search), which is the
  * request-scale/data-scale line the batch operators draw at `.head()`.
  */
object SearchStream {

  /** Serve a stream of search requests. `requests` must have a `query_id`
    * string column; requests are answered once per DISTINCT id per
    * micro-batch (callers needing per-request correlation join the answers
    * back on query_id). Each micro-batch hands the unioned result rows (the
    * batch search schema, one block of ≤ k rows per answered id) to
    * `onResult`, then `badRequest` once per id that failed (unknown or null
    * query_id — a serving endpoint must outlive a typo, not die with the
    * stream; the remaining ids in the batch are still answered). Per-batch
    * pins are released even when a request fails.
    */
  def serve(spark: SparkSession, dir: String, requests: DataFrame,
            m: Int = 100, l: Int = 50, k: Int = 15,
            badRequest: (String, Throwable) => Unit = (_, _) => ())
           (onResult: (DataFrame, Long) => Unit): StreamingQuery =
    requests.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val ids = batch.select("query_id").distinct()
        .collect().map(_.getString(0)).filter(_ != null).sorted
      try {
        val answers = ids.flatMap { q =>
          try Some(CombinedScorer.search(spark, dir, q, m, l, k))
          catch { case scala.util.control.NonFatal(e) => badRequest(q, e); None }
        }
        if (answers.nonEmpty) onResult(answers.reduce(_.unionAll(_)), id)
      } finally
        // per-batch pins (ranked lists, metadata scores) die with the batch
        graft.Caching.release()
    }.start()
}
