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
    * string column (extra columns ride along untouched into `onResult`).
    * Each micro-batch answers its distinct requests through
    * [[CombinedScorer.search]] and hands the unioned result rows (the batch
    * search schema, one block of ≤ k rows per request) to `onResult`.
    */
  def serve(spark: SparkSession, dir: String, requests: DataFrame,
            m: Int = 100, l: Int = 50, k: Int = 15)
           (onResult: (DataFrame, Long) => Unit): StreamingQuery =
    requests.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val ids = batch.select("query_id").distinct()
        .collect().map(_.getString(0)).sorted
      if (ids.nonEmpty) {
        val answers = ids.map(q => CombinedScorer.search(spark, dir, q, m, l, k))
          .reduce(_.unionAll(_))
        onResult(answers, id)
        // per-batch pins (ranked lists, metadata scores) die with the batch
        graft.Caching.release()
      }
    }.start()
}
