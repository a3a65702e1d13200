package graft

import graft.search.{Bm25, CombinedScorer, DistanceJoin, Matcher, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** User-facing facade — the one-session replacement for danae's four
  * services. A reference user's workflow maps 1:1:
  *
  *   publish catalogue → `ingest.Catalog.publish` + `profilePending`
  *   "Find Similar" UI → `Engine.search(SearchRequest(...))`
  *
  * The request shape mirrors the UI's JSON spec (ui/ui.py:305-312,
  * FIXTURES.md §B.5): per-column content weights, per-field metadata
  * weights, a content/metadata split, and M/L/k knobs. Weights are
  * normalized to sum 1 like ui/dataset_graph.py:102-122 (G4).
  */
object Engine {

  case class ContentSpec(columns: Map[String, Double] = Map.empty,
                         weight: Double = 0.5)
  case class MetadataSpec(fields: Map[String, Double] =
                            Map("title" -> 1.0, "keywords" -> 1.0,
                                "description" -> 1.0),
                          weight: Double = 0.5)
  case class SearchRequest(queryId: String,
                           content: ContentSpec = ContentSpec(),
                           metadata: MetadataSpec = MetadataSpec(),
                           m: Int = 100, l: Int = 50, k: Int = 15)

  /** Normalize a weight map to sum 1 (ui/dataset_graph.py:102-122). */
  def normalize(w: Map[String, Double]): Map[String, Double] = {
    val s = w.values.sum
    if (s <= 0) w else w.map { case (k, v) => k -> v / s }
  }

  /** Normalize the content/metadata split to sum 1. */
  def normalizeSplit(req: SearchRequest): (Double, Double) = {
    val s = req.content.weight + req.metadata.weight
    if (s <= 0) (0.5, 0.5) else (req.content.weight / s, req.metadata.weight / s)
  }

  /** Quantize a normalized weight map to integer micro-numerators summing
    * EXACTLY 1e6 (largest-key remainder absorption, deterministic): the
    * resolution any UI slider works at, and what makes the weighted matching
    * argmax integer-exact across engines (see
    * [[search.Matcher.contentScoresExactWeighted]]).
    */
  def microWeights(w: Map[String, Double]): Map[String, Long] = {
    val norm = normalize(w).toSeq.sortBy(_._1)
    val head = norm.init.map { case (k, v) => k -> math.round(v * 1e6) }
    val last = norm.last._1 -> (1000000L - head.map(_._2).sum)
    (head :+ last).toMap
  }

  /** Full similarity search honoring per-column and per-field weights.
    * Response rows mirror combined_search.py:152-155: result id, content /
    * metadata / overall scores, and the column-matching payload.
    */
  def search(spark: SparkSession, dir: String, req: SearchRequest): DataFrame = {
    val (wc, wm) = normalizeSplit(req)
    val sketch = Sketches.cachedAll(spark, dir)
    // Column selection restricts the QUERY projection only; the index side is
    // never filtered — the reference trains on every column, so rank/kth are
    // computed over the full index regardless of the user's selection.
    val queryCols =
      if (req.content.columns.isEmpty) None
      else Some(req.content.columns.keys.toSeq)
    // request-bounded ranked list, materialized once as a LocalRelation
    // (DistanceJoin.localRanked): its two consumers (candidate ids, kth)
    // then broadcast without a job each
    val qLocal = Some(Sketches.queryLocal(spark, dir, req.queryId))
    val ranked = DistanceJoin.localRanked(DistanceJoin.knn(sketch,
      req.queryId, req.m, req.l, queryCols = queryCols, localQuery = qLocal))

    // per-field query text: each selected metadata field is matched against
    // the query dataset's own value for that field (metadata_search.py:14-24),
    // with the user's normalized per-field weights (dataset_graph.py:102-112)
    val (qTitle, qKeywords, qDesc) =
      CombinedScorer.queryMetaRow(spark, dir, req.queryId)
    val fieldText = Map(
      "title" -> qTitle,
      "keywords" -> qKeywords,
      "description" -> qDesc)
    val fieldSpecs = normalize(req.metadata.fields).toSeq.sortBy(_._1).map {
      case (f, w) =>
        (f, w, fieldText(f).toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq)
    }
    // same stats-artifact serving path as CombinedScorer.search (exact
    // integer adjustment for the excluded query dataset): literal-map stats
    // + driver tail inside the budget (LocalRelation, candidate ids as
    // literals — the fused 5-job request shape), DF path past it
    val qtfReq = CombinedScorer.metaTermFreqs(spark, dir)
      .filter(col("doc_id") =!= req.queryId && Bm25.isQueryTerm(fieldSpecs))
    val (metaScoresP, metaIdsLocal) =
      CombinedScorer.metaStatsLocal(spark, dir, req.queryId, fieldSpecs) match {
        case Some((dlL, corpusL, dfreqL)) =>
          val served = Bm25.multiFieldServed(qtfReq, dlL, corpusL, dfreqL,
              fieldSpecs)
            .select(col("doc_id").as("c_dataset"),
              col("score").as("metadata_score"))
          (served, Some(served.collect().map(_.getString(0)).toSeq))
        case None =>
          val (bmDl, bmCorpus, bmDfreq) =
            CombinedScorer.metaStatsFor(spark, dir, req.queryId, fieldSpecs)
          // pinned: consumed by candidateEdges (extra candidates) AND the
          // final combine — one BM25 pass instead of two
          (Caching.temp(Bm25.multiFieldWithStats(qtfReq,
              bmDl, bmCorpus, bmDfreq, fieldSpecs)
            .select(col("doc_id").as("c_dataset"),
              col("score").as("metadata_score"))), None)
      }

    val edges = DistanceJoin.candidateEdges(sketch, req.queryId, ranked,
      extraCandidates =
        if (metaIdsLocal.isDefined) None
        else Some(metaScoresP.select("c_dataset")),
      queryCols = queryCols, localQuery = qLocal,
      extraCandidateIds = metaIdsLocal)
    // Exact integer-micro matching on both branches (the oracle-coverable
    // path): uniform weights apply AFTER the argmax (contentScoresExact),
    // non-uniform weights multiply the edge micros BEFORE it.
    val content =
      if (req.content.columns.isEmpty) {
        val nQueryCols = Sketches.columnCount(spark, dir, req.queryId)
        Matcher.contentScoresExact(edges, nQueryCols)
      } else {
        Matcher.contentScoresExactWeighted(edges, microWeights(req.content.columns))
      }

    CombinedScorer.combineExact(content, metaScoresP,
      wcMicro = math.round(wc * 1e6), k = req.k)
      .withColumn("query_id", lit(req.queryId))
  }
}
