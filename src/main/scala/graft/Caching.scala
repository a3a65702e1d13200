package graft

import org.apache.spark.sql.DataFrame
import java.util.concurrent.ConcurrentLinkedQueue

/** Lifecycle owner for per-query ephemeral caches.
  *
  * Several operators pin an intermediate (typically the tokenized TF table)
  * because Catalyst cannot reuse exchanges across column-pruned branches —
  * without the pin the corpus is re-scanned once per statistic branch. Those
  * pins are QUERY-scoped, not application-scoped: a long-lived service that
  * never unpersists them accumulates cached RDDs for its whole lifetime.
  *
  * Operators register such pins here via [[temp]]; the driver of a batch of
  * queries (graft.Bench, graft.Verify, or user code) calls [[release]] once
  * the query's action has completed. Releasing is always safe — an
  * unpersisted frame silently recomputes if referenced again. Long-lived
  * index caches (the sketch table in [[graft.search.Sketches]]) deliberately
  * do NOT go through this registry: their lifecycle is the service's.
  */
object Caching {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[release]]. */
  def temp(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Unpersist every registered frame (non-blocking). Call after the
    * query's action completes; callers that never call this own the cache
    * lifecycle themselves.
    */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = live.poll()
    }
  }
}
