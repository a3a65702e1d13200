package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators a large-scale training-data pipeline needs
  * beyond pairwise dedup: turning near-dup PAIRS into canonical CLUSTERS,
  * benchmark decontamination, repetition-quality metrics (Gopher-style), and
  * deterministic sampling / per-group quota mixing. (LLM-pipeline extras —
  * not part of the danae reference surface.)
  */
object CorpusOps {

  /** Connected components over an undirected edge list: labels every node
    * with the minimum node id reachable from it (the canonical cluster id a
    * dedup pipeline keeps ONE representative of).
    *
    * Runs GraphX's Pregel ConnectedComponents (whose labels ARE the minimum
    * reachable vertex id), then left-joins isolated nodes back as their own
    * singleton clusters. An iterative fixpoint is the one place the RDD
    * layer beats DataFrames: a hand-rolled DataFrame loop re-plans and
    * re-codegens every round's joins (measured 8-11s on a 300-node fixture
    * where GraphX takes ~1s), while Pregel reuses one co-partitioned edge
    * RDD across rounds with no planning in the loop. O(diameter) rounds;
    * near-dup graphs are dense little cliques, so rounds stay single-digit
    * at any corpus scale.
    *
    * @param nodes one column `id`
    * @param pairs two columns `id_a`, `id_b` (undirected, any orientation)
    * @return (id, cluster_id)
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val edgeRdd = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].rdd
    val graph = org.apache.spark.graphx.Graph.fromEdgeTuples(edgeRdd, 0)
    val labeled = graph.connectedComponents().vertices
      .toDF("id", "cluster_id")
    nodes.select(col("id").cast("long"))
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** DataFrame-native connected components — the large-star / small-star
    * alternation (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): converges to min-id star labels in O(log² n)
    * rounds, each round two keyed aggregates + co-partitioned joins and a
    * distinct. The scale twin of the GraphX [[connectedComponents]]: no
    * RDD/vertex caching, AQE and codegen stay in play, and the per-round
    * shuffles are plain exchanges a 1000-executor cluster re-plans like any
    * other query. Labels are IDENTICAL to GraphX's (both converge to the
    * component min — spec-locked on chains, stars and the fixture pairs).
    *
    *  - large-star(u): every neighbor v > u connects to
    *    m(u) = min(Γ(u) ∪ u) — hubs shatter toward the min;
    *  - small-star(u): every neighbor v ≤ u (and u) connects to the local
    *    min — chains flatten.
    *
    * Convergence check: (count, Σ xxhash64) signature of the canonical
    * edge set — one tiny driver action per round, like the PageRank loop;
    * lineage cut every `checkpointEvery` rounds. If `maxRounds` runs out
    * before the fixpoint the edge set need not be a star (a `hi` could
    * still carry several `lo` labels, and labels need not be minimal), so
    * the loop FAILS LOUDLY instead of emitting silently-wrong clusters;
    * the closing join additionally folds min(lo) per hi, which is always
    * safe and free at star shape (one row per hi).
    */
  def connectedComponentsDF(nodes: DataFrame, pairs: DataFrame,
                            maxRounds: Int = 50,
                            checkpointEvery: Int = 1): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.select(greatest(col("a"), col("b")).as("hi"),
          least(col("a"), col("b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
    def signature(df: DataFrame): (Long, Long) = {
      // bit_xor fold: order-free and overflow-free under ANSI arithmetic
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(hi, lo))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    // Lineage MUST be cut every round (checkpointEvery=1): one round's
    // plan references the previous round's frame ~6 times (sym twice, the
    // two star joins, the closing union), so an uncut round multiplies
    // recomputation of everything beneath it by that fan-out —
    // checkpointEvery=2 was measured at 70s for ONE such doubled round on
    // a 173k-edge rep graph (driver-deterministic, both draws), vs ~1s
    // with per-round cuts. The initial canon is cut for the same reason.
    var e = canon(pairs.select(col("id_a").cast("long").as("a"),
      col("id_b").cast("long").as("b"))).localCheckpoint(eager = false)
    var sig = signature(e)
    var round = 0
    var converged = sig._1 == 0L
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime
      // large-star
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mu = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = canon(sym.join(mu, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
      // small-star (edges already point hi → lo)
      val m2 = ls.groupBy("hi").agg(min("lo").as("m"))
      val ss = canon(
        ls.join(m2, "hi").select(col("lo").as("a"), col("m").as("b"))
          .union(m2.select(col("hi").as("a"), col("m").as("b"))))
      e = if (round % checkpointEvery == checkpointEvery - 1)
        ss.localCheckpoint(eager = false) else ss
      val s2 = signature(e)
      converged = s2 == sig
      sig = s2
      round += 1
      if (dbg) System.err.println(
        f"[ccDF] round $round: ${(System.nanoTime - t0) / 1e9}%.2fs " +
          s"edges=${s2._1}")
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsDF did not converge in $maxRounds rounds " +
          s"(edge signature still moving: $sig) — raise maxRounds")
    nodes.select(col("id").cast("long"))
      .join(e.groupBy(col("hi").as("id")).agg(min("lo").as("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** [[connectedComponentsDF]] with a driver union-find fast path for
    * BOUNDED graphs: when both node and edge counts fit `maxDriverRows`,
    * collect and label on the driver (union-find with path compression,
    * then min-id per component — the identical labels both distributed
    * algorithms converge to, spec-locked), else run the distributed loop.
    *
    * The gate exists for graphs whose size is bounded by something other
    * than the corpus — the media rep graph is bounded by the feature
    * LATTICE (11k nodes / 173k edges at sf10, flat in the corpus), so its
    * component pass is driver-trivial at any SF while the star loop pays
    * ~7 Spark rounds of fixed job overhead (measured 5-7s at bench scale
    * for a graph that union-finds in microseconds). Corpus-bounded graphs
    * blow the budget and take the distributed path unchanged — the same
    * documented-bound-plus-fallback contract as CombinedScorer.metaStats.
    */
  def connectedComponentsAuto(nodes: DataFrame, pairs: DataFrame,
                              maxDriverRows: Long = 2000000L): DataFrame = {
    val spark = nodes.sparkSession
    val probe = boundedCollect(nodes, pairs, maxDriverRows)
    if (probe.isEmpty) return connectedComponentsDF(nodes, pairs)
    val (ids, edges) = probe.get
    val labelOf = unionFindLabels(ids, edges)
    import spark.implicits._
    ids.map(id => (id, labelOf.get(id))).toSeq.toDF("id", "cluster_id")
  }

  /** (node ids, edges) if BOTH fit `maxDriverRows`, else None — two
    * limit-probed collect jobs, no separate count jobs.
    */
  private[extra] def boundedCollect(nodes: DataFrame, pairs: DataFrame,
      maxDriverRows: Long): Option[(Array[Long], Array[(Long, Long)])] = {
    val lim = (math.min(maxDriverRows, Int.MaxValue - 1L) + 1L).toInt
    val n = nodes.select(col("id").cast("long")).limit(lim).collect()
    if (n.length >= lim) return None
    val e = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .limit(lim).collect()
    if (e.length >= lim) return None
    Some((n.map(_.getLong(0)), e.map(r => (r.getLong(0), r.getLong(1)))))
  }

  /** Driver union-find with path compression; returns id → component-min
    * label for every id in `ids` ∪ edge endpoints.
    */
  private[extra] def unionFindLabels(ids: Array[Long],
      edges: Array[(Long, Long)]): java.util.HashMap[Long, Long] = {
    val parent = new java.util.HashMap[Long, Long](ids.length * 2)
    ids.foreach(id => parent.put(id, id))
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val minOf = new java.util.HashMap[Long, Long]()
    parent.keySet().forEach { id =>
      val r = find(id)
      val cur = minOf.getOrDefault(r, Long.MaxValue)
      if (id < cur) minOf.put(r, id)
    }
    val labels = new java.util.HashMap[Long, Long](parent.size() * 2)
    parent.keySet().forEach { id => labels.put(id, minOf.get(find(id))) }
    labels
  }

  /** Dedup clustering: near-dup pairs (from any of Dedup's generators) →
    * per-document cluster assignment plus the keep/drop decision (keep the
    * minimum doc_id of each cluster — the standard canonicalization in
    * MinHash dedup pipelines). Singleton docs are their own cluster.
    *
    * @return (doc_id, cluster_id, is_rep 1|0)
    */
  def dedupClusters(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    // Auto: driver union-find under the budget (near-dup pair tables are
    // usually far smaller than the corpus), the DF-native star loop past
    // it — labels identical to the GraphX form either way (spec-locked)
    connectedComponentsAuto(docs.select(col(idCol).as("id")), pairs)
      .select(col("id").as("doc_id"), col("cluster_id"),
        when(col("id") === col("cluster_id"), 1L).otherwise(0L).as("is_rep"))

  /** Quality-aware canonical selection over near-dup clusters: where
    * [[dedupClusters]] nominates the min-id member, real pipelines keep the
    * BEST copy — per cluster the member with the highest composite quality
    * ([[TextStats.stats]]), ties to the smaller doc_id. One window per
    * cluster (cluster-sized partitions); quality is a 6-decimal value on
    * both engines so the sort key is reproducible.
    *
    * @return (doc_id, cluster_id, quality, keep) — keep = 1 for the
    *         cluster's canonical member, singletons keep themselves
    */
  def dedupRepresentatives(docs: DataFrame, idCol: String, textCol: String,
                           pairs: DataFrame): DataFrame = {
    val clusters = dedupClusters(docs, idCol, pairs).select("doc_id", "cluster_id")
    val quality = TextStats.stats(docs, idCol, textCol)
      .select(col("doc_id"), col("quality"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc_nulls_last, col("doc_id").asc)
    clusters.join(quality, "doc_id")
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        when(col("rk") === 1, 1L).otherwise(0L).as("keep"))
  }

  /** Percentile-threshold quality gating (the Gopher-style "drop the worst
    * X%" filter with the cut derived from the corpus itself, not a magic
    * constant like [[CorpusPipeline.select]]'s minQuality): score every
    * document with the composite quality ([[TextStats.stats]]), take the
    * `dropFrac` quantile of the corpus-wide quality distribution through
    * the exact histogram-quantile pipeline (multiset-interpolated like
    * DuckDB's quantile_cont, 6-decimal grid on both engines), and keep the
    * documents at or above it. The threshold is a 1-row broadcast. The
    * corpus-wide cumulative window runs unpartitioned (Spark warns) — by
    * DESIGN it is bounded, not corpus-sized: quality lives on the 6-decimal
    * [0,1] grid, so the value histogram behind the quantile can never
    * exceed ~10^6 + 1 rows however large the corpus; the corpus-sized work
    * (scoring + histogram partial-agg) is fully parallel before it.
    * NULL-quality (empty) documents never pass.
    *
    * @return (doc_id, quality, threshold) for surviving documents
    */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
                  dropFrac: Double = 0.1): DataFrame = {
    // query-scoped pin: the scored frame feeds BOTH the threshold quantile
    // and the output filter — unpinned, each consumer re-scores the corpus
    // (two full scans at lake scale). Two slim columns, released by the
    // driver's post-query release() (see graft.Caching).
    val q = graft.Caching.temp(TextStats.stats(docs, idCol, textCol)
      .select(col("doc_id"), col("quality")))
    val stream = q.filter(col("quality").isNotNull)
      .select(lit("corpus").as("dataset_id"), lit("quality").as("col_name"),
        col("quality").as("v"))
    val thr = graft.ingest.Profiler.histogramQuantiles(stream, ps = Seq(dropFrac))
      .select(col("v").as("threshold"))
    q.crossJoin(broadcast(thr)).filter(col("quality") >= col("threshold"))
  }

  /** Cross-source quality normalization: raw quality scores are NOT
    * comparable across (lang, source) groups — each source has its own
    * score distribution, so one global threshold over-prunes some sources
    * and under-prunes others (the reason CCNet buckets perplexity
    * percentiles per language rather than thresholding raw scores). Report
    * each document's quality percentile within its (lang, source) group
    * AND corpus-wide: percent_rank = strictly-lower-count / (n-1), ties
    * share a rank, single-row groups are 0.
    *
    * No corpus-sized window anywhere: quality is 6-decimal-rounded, so the
    * cumulative distribution lives on a value GRID of ≤ 10^6+1 rows (the
    * same bounded-grid trick as [[qualityGate]]) — the per-group windows
    * run over grid rows partitioned by group, and the single unpartitioned
    * window runs over the global grid, corpus-size-independent by
    * construction. Docs then pick their percentiles up by an equi-join on
    * the rounded value.
    *
    * @return (doc_id, lang, source, quality, pct_group, pct_global) for
    *         docs with a non-NULL quality
    */
  def qualityNorm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = graft.Caching.temp(
      TextStats.stats(docs, idCol, textCol).select(col("doc_id"), col("quality"))
        .join(docs.select(col(idCol).as("doc_id"), col("lang"), col("source")),
          "doc_id")
        .filter(col("quality").isNotNull))
    val wGrp = Window.partitionBy("lang", "source").orderBy("quality")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("quality")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gGrid = scored.groupBy("quality").agg(count(lit(1)).as("c"))
      .withColumn("cum_lt", coalesce(sum("c").over(wAll), lit(0L)))
    val sGrid = scored.groupBy("lang", "source", "quality")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum_lt_g", coalesce(sum("c").over(wGrp), lit(0L)))
    val nGrp = scored.groupBy("lang", "source").agg(count(lit(1)).as("n_g"))
    val nAll = scored.agg(count(lit(1)).as("n_all"))
    scored
      .join(sGrid.select("lang", "source", "quality", "cum_lt_g"),
        Seq("lang", "source", "quality"))
      .join(broadcast(gGrid.select("quality", "cum_lt")), Seq("quality"))
      .join(broadcast(nGrp), Seq("lang", "source"))
      .crossJoin(broadcast(nAll))
      .select(col("doc_id"), col("lang"), col("source"), col("quality"),
        when(col("n_g") > 1,
          round(col("cum_lt_g").cast("double") / (col("n_g") - 1), 6))
          .otherwise(0.0).as("pct_group"),
        when(col("n_all") > 1,
          round(col("cum_lt").cast("double") / (col("n_all") - 1), 6))
          .otherwise(0.0).as("pct_global"))
  }

  /** The ONE word-n-gram stream all gram consumers share (decontamination,
    * repetition metrics, Dedup.shinglePairs): (doc_id, gram) with every
    * occurrence, or set-semantics with `distinct`. Pure column expressions
    * (transform/slice/array_join — codegen'd, no UDF); a tokenization tweak
    * here reaches every gram-based operator AND their oracles at once.
    */
  def gramStream(df: DataFrame, idCol: String, textCol: String, w: Int,
                 distinct: Boolean): DataFrame =
    // one-pass codegen kernel: the transform(sequence, slice+array_join)
    // composition ran the lambda body interpreted per gram (Slice/ArrayJoin
    // eval — the sf10 corpus_build probe's top stacks); identical strings,
    // docs shorter than w tokens yield an empty array ≡ the old pre-filter.
    // distinct = per-doc IN-ROW dedupe before the explode: rows are
    // (doc_id, gram), so it equals the old corpus-wide DISTINCT exchange
    // row-for-row while shuffling nothing
    df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextGrams.lowerSpaceGrams(
        col(textCol), w, distinct)).as("gram"))

  /** Distinct word w-grams per document: (doc_id, gram). */
  def wordGrams(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    gramStream(df, idCol, textCol, w, distinct = true)

  /** Benchmark decontamination: flag training documents sharing any word
    * w-gram with a held-out benchmark set (the standard n-gram-collision
    * check run before training so eval data is not memorized). The benchmark
    * gram set is tiny relative to the corpus → broadcast, so the scan of the
    * training side is one pass with a map-side hash join, no shuffle of the
    * corpus. Here the benchmark is carved deterministically out of the same
    * table (doc_id % benchMod == 0) so the oracle can reproduce it; in
    * production it is its own table and only the join below matters.
    *
    * @return (doc_id, n_overlap, contaminated 1|0) for every NON-benchmark doc
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    w: Int = 5, benchMod: Int = 97): DataFrame = {
    val grams = wordGrams(docs, idCol, textCol, w)
    val bench = grams.filter(col("doc_id") % benchMod === 0)
      .select("gram").distinct()
    val overlaps = grams.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), "gram")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    docs.filter(col(idCol) % benchMod =!= 0)
      .select(col(idCol).as("doc_id"))
      .join(overlaps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_overlap"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("contaminated"))
  }

  /** [[decontaminate]]'s shape for a benchmark set too large to broadcast-
    * join: a Bloom filter over the benchmark grams (≈1.2 bytes/gram at 3%
    * fpp vs ~40 bytes of gram string — 30× smaller broadcast) prefilters the
    * corpus gram stream, then the EXACT join runs only on the bloom
    * survivors. Bloom filters have no false negatives, so the result is
    * identical to the exact path (CorpusOpsSpec asserts equality); false
    * positives merely let a few extra grams into the verify join. At 100 TB
    * this is the difference between shuffling every corpus gram into a
    * sort-merge join and shuffling only the ~fpp tail. Building the filter
    * is one extra aggregation pass over the (tiny) benchmark side — the
    * standard build-artifact-then-scan two-phase job.
    */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
                         w: Int = 5, benchMod: Int = 97,
                         fpp: Double = 0.03): DataFrame = {
    val grams = wordGrams(docs, idCol, textCol, w)
    val bench = grams.filter(col("doc_id") % benchMod === 0)
      .select("gram").distinct()
    // the count fixes the filter's size — part of the build phase, like
    // fitting any index artifact; NOT in the per-query path
    val bloom = bench.stat.bloomFilter("gram", math.max(bench.count(), 1L), fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bc.value.mightContainString(g))
    val overlaps = grams.filter(col("doc_id") % benchMod =!= 0)
      .filter(mightContain(col("gram"))) // no false negatives → lossless
      .join(bench, "gram")               // exact verify drops the fpp tail
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    docs.filter(col(idCol) % benchMod =!= 0)
      .select(col(idCol).as("doc_id"))
      .join(overlaps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(coalesce(col("n_overlap"), lit(0L)) > 0, 1L).otherwise(0L)
          .as("contaminated"))
  }

  /** Most-frequent word n-gram per doc (count ties broken by gram asc for
    * determinism): (doc_id, top_cnt, top_len) where top_len is the gram's
    * character length.
    */
  /** Gopher-style repetition metrics (Rae et al. 2021, Table A1): the
    * duplicate-word ratio (1 - distinct/total tokens) and, for n ∈ {2,3},
    * the fraction of characters contained in the doc's most frequent word
    * n-gram (count × gram length / total chars). High values mark the
    * boilerplate/looping documents every corpus filter drops.
    *
    * ONE per-row projection, zero exchange: a document's top n-gram is a
    * per-document statistic ([[graft.functions.TextGrams.topGramOf]] —
    * same (count DESC, gram ASC) winner the former corpus-sized
    * (doc, gram) aggregate + per-doc window selected, spec-locked equal),
    * so at 100 TB this is a mapper, not two gram shuffles. The former
    * aggregate form's left-join miss (doc shorter than n tokens) is the
    * kernel's NULL struct → coalesce 0, as before.
    *
    * @return (doc_id, dup_word_ratio, top2_frac, top3_frac) — ratios rounded
    *         to 6; 0.0 when the doc is too short to have an n-gram.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextTokens.lowerSpaceTokens(col(textCol))
    def topChars(n: Int): Column = {
      val tg = graft.functions.TextGrams.topGramStats(col(textCol), n)
      coalesce(tg.getField("top_cnt") * tg.getField("top_len"), lit(0L))
    }
    df.select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        topChars(2).as("t2_chars"), topChars(3).as("t3_chars"))
      .select(col("doc_id"),
        when(col("n_tokens") > 0,
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6))
          .otherwise(0.0).as("dup_word_ratio"),
        when(col("n_chars") > 0,
          round(col("t2_chars").cast("double") / col("n_chars"), 6))
          .otherwise(0.0).as("top2_frac"),
        when(col("n_chars") > 0,
          round(col("t3_chars").cast("double") / col("n_chars"), 6))
          .otherwise(0.0).as("top3_frac"))
  }

  /** Cross-document repetition: the fraction of a doc's distinct word
    * w-grams that also appear in at least one OTHER document — the
    * "duplicated n-gram fraction" corpus filters gate on (boilerplate,
    * templated spam, licence headers) as distinct from [[repetitionMetrics]]'
    * intra-document loops. One gram shuffle for the document frequencies,
    * one join back; both keyed on gram/doc_id, linear at corpus scale
    * (the df table is vocabulary-sized, not corpus-sized).
    *
    * @return (doc_id, n_grams, n_dup_grams, dup_frac)
    */
  def crossDocRepetition(df: DataFrame, idCol: String, textCol: String,
                         w: Int = 5): DataFrame = {
    val grams = gramStream(df, idCol, textCol, w, distinct = true)
    val docsWith = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("docs_with"))
    grams.join(docsWith, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("docs_with") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6)
          .as("dup_frac"))
  }

  /** GPT-style sequence packing map: documents are concatenated in
    * deterministic doc_id order and chunked into fixed token budgets; each
    * doc's row says which training chunk(s) it lands in (docs straddle
    * budget boundaries, as concatenate-and-chunk training does).
    *
    * Scale shape (round 18, guide §2): the global running total is
    * SIZE-ADAPTIVE like the profiler's quantile cumsum. Under 64 MB of
    * compressed (id, text) bytes — the Catalyst estimate, no action — it
    * is one global cumulative window, the cheapest plan at fixture size.
    * Past the gate it is [[graft.ingest.Profiler.bucketedCumulative]]:
    * content-derived bucket boundaries (md5-sampled doc_id quantiles, so
    * both consuming subtrees agree under any physical plan), local cumsum
    * per bucket, per-bucket subtotals prefix-summed and broadcast back —
    * no task ever holds more than ~corpus/parallelism rows, where the
    * single-partition window would stream every document through one task.
    * Output is IDENTICAL for any bucket count (bucket order follows
    * doc_id order and equal ids share a bucket) — asserted by
    * CorpusOpsSpec on both paths.
    *
    * @return (doc_id, n_tokens, start_tok, bin_first, bin_last)
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Long = 2048): DataFrame = {
    val bytes = docs.select(col(idCol), col(textCol))
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val buckets =
      if (bytes < (64L << 20)) 1
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    packSequencesBucketed(docs, idCol, textCol, budget, buckets)
  }

  /** [[packSequences]] with the cumsum strategy pinned — the testable form
    * (CorpusOpsSpec proves both paths byte-identical on the fixture).
    */
  private[graft] def packSequencesBucketed(docs: DataFrame, idCol: String,
                                           textCol: String, budget: Long,
                                           buckets: Int): DataFrame = {
    val nToks = size(graft.functions.TextTokens.lowerSpaceTokens(col(textCol)))
      .cast("long")
    val base = docs.select(col(idCol).as("doc_id"), nToks.as("n_tokens"))
    val withCum =
      if (buckets <= 1) {
        val w = Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        base.withColumn("cum", sum("n_tokens").over(w))
      } else
        graft.ingest.Profiler.bucketedCumulative(
          base.select(lit(0).as("g"), col("doc_id").as("v"),
            col("n_tokens").as("cnt")), buckets, Seq("g"))
          .select(col("v").as("doc_id"), col("cnt").as("n_tokens"),
            col("cum"))
    withCum.select(col("doc_id"), col("n_tokens"),
      (col("cum") - col("n_tokens")).as("start_tok"),
      floor((col("cum") - col("n_tokens")) / budget).as("bin_first"),
      floor((col("cum") - 1) / budget).as("bin_last"))
  }

  /** Deterministic md5-derived sampling hash in [0, 100): the cross-engine
    * reproducible way to subsample a corpus (Spark `conv(substr(md5))` ≡
    * DuckDB `('0x'||substr(md5))::BIGINT` — same trick as Dedup's MinHash).
    * Content-independent of partitioning, stable across runs and engines —
    * unlike `rand()` or `TABLESAMPLE`, a re-run or a repartition cannot
    * change the sample.
    */
  def sampleBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Deterministic train/val/test assignment from the same md5 bucket: a
    * document's split never changes across runs, engines, or repartitions —
    * the property that keeps eval sets stable as a corpus grows (new docs
    * land in splits at the configured rates; existing docs never migrate).
    */
  def splitAssign(docs: DataFrame, idCol: String,
                  trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = sampleBucket(col(idCol))
    docs.select(col(idCol).as("doc_id"), col("lang"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Split-leakage audit — QUANTIFIES the contamination [[splitAssignBy]]
    * exists to prevent: how many near-duplicate pairs straddle the
    * per-document hash split's boundaries. A (train, test) row with a
    * non-zero count is eval contamination (the test doc has a near-copy in
    * training data); the diagonal rows are harmless within-split
    * duplication. Pair generation is the prefix-filtered Jaccard join
    * (bounded candidates at any corpus size); the rollup keys on the
    * unordered split pair so (train,test) and (test,train) pool.
    *
    * @return (split_a, split_b, n_pairs, n_leaking) with split_a <= split_b
    *         alphabetically; n_leaking = n_pairs off the diagonal, 0 on it
    */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.9): DataFrame = {
    // same md5 bucket rule as splitAssign, schema-independent (no lang col)
    val b = sampleBucket(col(idCol))
    val splits = docs.select(col(idCol).as("doc_id"),
      when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
    val pairs = Dedup.jaccardPairs(docs, idCol, textCol, threshold)
    val sa = splits.select(col("doc_id").as("id_a"), col("split").as("sa"))
    val sb = splits.select(col("doc_id").as("id_b"), col("split").as("sb"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_leaking",
        when(col("split_a") === col("split_b"), lit(0L))
          .otherwise(col("n_pairs")))
  }

  /** Group-aware (leakage-safe) split: every document sharing `groupCol`
    * (URL domain, source site, near-dup cluster id, author …) lands in the
    * SAME split. Per-doc assignment lets within-group near-duplicates
    * straddle train and test — the classic contamination path that inflates
    * eval scores; hashing the GROUP key closes it while keeping
    * [[splitAssign]]'s determinism (a group never migrates as the corpus
    * grows, and the bucket is derived from data, so any engine and any
    * partitioning reproduce it). Shuffle-free: the split is a scalar
    * expression on each row's own group value — no join against a group
    * table, which matters when groups number in the billions.
    */
  def splitAssignBy(docs: DataFrame, idCol: String, groupCol: String,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = sampleBucket(col(groupCol))
    docs.select(col(idCol).as("doc_id"), col(groupCol).as("group_key"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Deterministic epoch shuffle: the reproducible global reshuffle every
    * training run needs — per epoch, each document gets a fresh md5 shuffle
    * key (seeded by the epoch number, so epochs are independent
    * permutations but any engine, any partitioning, any re-run reproduces
    * epoch e exactly), a shard, and its position within the shard. The
    * training order IS (shard ASC, pos ASC); a global row number is
    * deliberately NOT materialized — that would be a single-partition
    * window. Sharding is how the order stays scale-safe: one window
    * partition per shard, each holding ~corpus/numShards rows, and readers
    * consume shard files in order (exactly how sharded training data is
    * laid out on disk — pair with [[graft.ingest.Compaction]] to write it).
    * The shard is the TOP byte-pair of the shuffle key, so shard boundaries
    * agree with global key order: (shard, key) sorts identically to key.
    *
    * @return (doc_id, epoch, shard, pos)
    */
  def epochOrder(docs: DataFrame, idCol: String, epoch: Int,
                 numShards: Int = 8): DataFrame = {
    require(numShards > 0 && numShards <= 65536, "numShards in (0, 65536]")
    val key = md5(concat_ws(":", lit(epoch), col(idCol).cast("string")))
    docs.select(col(idCol).as("doc_id"), lit(epoch.toLong).as("epoch"),
        key.as("skey"))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 4), 16, 10).cast("long")
          * numShards / 65536).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("skey"), col("doc_id")))
        .cast("long"))
      .select("doc_id", "epoch", "shard", "pos")
  }

  /** Epoch → shard → packed-sequence manifest: [[epochOrder]]'s shuffle
    * composed with [[packSequences]]'s concatenate-and-chunk map into the
    * artifact a trainer actually consumes — per epoch, documents laid out
    * in (shard, pos) order, each annotated with its token offset and the
    * fixed-budget training sequence(s) it lands in WITHIN ITS SHARD (shard
    * files are packed independently, exactly how sharded training data sits
    * on disk; a reader streams shard k and cuts sequences at `budget`
    * boundaries without any cross-shard coordination).
    *
    * One corpus scan, ONE window shuffle: the shuffle key and token count
    * come from the same projection (no join back to the corpus), and the
    * position row-number and the cumulative token sum share one
    * (shard)-partitioned sort — this is also packSequences' promised
    * scale path, since no single-partition global window appears (the
    * per-shard cumsum replaces it, ~corpus/numShards rows per task).
    *
    * @return (doc_id, epoch, shard, pos, n_tokens, start_tok, seq_first,
    *         seq_last) — start_tok is the offset within the shard's
    *         concatenated token stream
    */
  def epochManifest(docs: DataFrame, idCol: String, textCol: String,
                    epoch: Int, numShards: Int = 8,
                    budget: Long = 2048): DataFrame = {
    require(numShards > 0 && numShards <= 65536, "numShards in (0, 65536]")
    val nToks = size(graft.functions.TextTokens.lowerSpaceTokens(col(textCol)))
      .cast("long")
    val key = md5(concat_ws(":", lit(epoch), col(idCol).cast("string")))
    val order = Window.partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    val cumW = order.rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col(idCol).as("doc_id"), nToks.as("n_tokens"), key.as("skey"))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 4), 16, 10).cast("long")
          * numShards / 65536).cast("long"))
      .withColumn("pos", row_number().over(order).cast("long"))
      .withColumn("cum", sum("n_tokens").over(cumW))
      .select(col("doc_id"), lit(epoch.toLong).as("epoch"), col("shard"),
        col("pos"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_tok"),
        floor((col("cum") - col("n_tokens")) / budget).as("seq_first"),
        floor((col("cum") - 1) / budget).as("seq_last"))
  }

  /** Token-budget selection — the "cut a fixed-token training drop" step:
    * keep the best documents by quality until the budget fills. Greedy
    * best-first over whole documents, no overflow (a document is selected
    * iff the running token total INCLUDING it fits the budget); order is
    * (quality DESC, doc_id ASC), NULL quality coalesced to 0 identically
    * on both engines.
    *
    * Scale shape: the running total is a TWO-LEVEL cumsum (the same
    * pattern as [[epochManifest]] / the profiler's size-gated quantile
    * pass) — 6-decimal quality buckets onto a fixed grid aligned with the
    * sort order, per-bucket token totals are a grid-sized aggregate whose
    * descending prefix sums ride a broadcast join back, and the
    * within-bucket cumsum partitions on the bucket — no single-partition
    * global window at any corpus size. floor(q·buckets) on the rounded
    * quality evaluates the same IEEE doubles in any engine, so bucket
    * boundaries cannot drift; and because quality is the LEADING sort
    * key, (bucket DESC, quality DESC, doc_id) orders identically to the
    * flat (quality DESC, doc_id) — the oracle's single window is
    * value-identical by construction.
    *
    * @return (doc_id, quality, n_tokens, cum_tokens, selected 1/0)
    */
  def budgetSelect(docs: DataFrame, idCol: String, textCol: String,
                   tokenBudget: Long, buckets: Int = 256): DataFrame = {
    val s = TextStats.stats(docs, idCol, textCol)
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("quality"), lit(0.0)).as("quality"))
      .withColumn("qb", floor(col("quality") * buckets).cast("int"))
    val wb = Window.orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = s.groupBy("qb").agg(sum("n_tokens").as("bt"))
      .withColumn("off", coalesce(sum("bt").over(wb), lit(0L)))
      .select("qb", "off")
    val wIn = Window.partitionBy("qb")
      .orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    s.join(broadcast(off), "qb")
      .withColumn("cum_tokens", col("off") + sum("n_tokens").over(wIn))
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("cum_tokens"),
        (col("cum_tokens") <= tokenBudget).cast("long").as("selected"))
  }

  /** Curriculum training schedule (Bengio et al. 2009 "Curriculum
    * Learning"; the modern LLM data-ordering recipes sort by a language-
    * model difficulty proxy): documents are banded easy→hard by the
    * corpus's own unigram-LM per-token log-prob ([[TextStats.lmScore]] —
    * higher logprob = more typical text = easier), each band splits into
    * deterministic md5 shards, and within a (band, shard) the order is a
    * content-independent md5 shuffle. A trainer consumes bands in
    * ascending order (band 0 = easiest), shards within a band in
    * parallel — the [[epochManifest]] consumption shape with a
    * difficulty-major axis.
    *
    * All-integer banding (the nbCalibration range-bucket rule): logprob
    * micros against a 1-row broadcast (min, max),
    * band = ((mx − sm)·bands) DIV (mx − mn + 1) — non-negative operands,
    * so Spark's DIV and the oracle's `//` agree. Empty documents carry no
    * trainable tokens and are excluded. Scale shape: one lmScore pass
    * (vocabulary-sized model join), a 1-row broadcast, and the only
    * window partitions on (band, shard) — ~corpus/(bands·shards)-sized
    * partitions, no global sort.
    *
    * @return (doc_id, band, shard, pos, n_tokens, lm_logprob)
    */
  def curriculumShards(docs: DataFrame, idCol: String, textCol: String,
                       bands: Int = 4, numShards: Int = 8,
                       tfTable: Option[DataFrame] = None): DataFrame = {
    require(bands > 0 && numShards > 0 && numShards <= 65536,
      "bands > 0, numShards in (0, 65536]")
    // pinned: the scored frame feeds the range aggregate AND the banding
    val lm = graft.Caching.temp(
      TextStats.lmScore(docs, idCol, textCol, tfTable)
        .filter(col("n_tokens") > 0)
        .withColumn("sm", round(col("lm_logprob") * 1e6).cast("long")))
    val range = lm.agg(min("sm").as("mn"), max("sm").as("mx"))
    val order = Window.partitionBy("band", "shard")
      .orderBy(col("skey"), col("doc_id"))
    lm.crossJoin(broadcast(range))
      .withColumn("band", expr(s"((mx - sm) * $bands) DIV (mx - mn + 1)"))
      .withColumn("skey",
        md5(concat_ws(":", lit("curr"), col("doc_id").cast("string"))))
      .withColumn("shard",
        (conv(substring(col("skey"), 1, 4), 16, 10).cast("long")
          * numShards / 65536).cast("long"))
      .withColumn("pos", row_number().over(order).cast("long"))
      .select("doc_id", "band", "shard", "pos", "n_tokens", "lm_logprob")
  }

  /** Corpus mixing: deterministic hash-sample at `samplePct`, then a per-
    * (lang, source) quality quota — keep the top `quota` docs of each group
    * by n_chars (tie-break doc_id). This is the "domain mixture" step of
    * corpus assembly: each (language, source) cell contributes a bounded,
    * best-first slice. One window shuffle keyed on the group; the sample
    * filter is applied BEFORE the shuffle so 100-samplePct% of the corpus
    * never moves.
    *
    * @return (doc_id, lang, source, n_chars, rk)
    */
  /** Temperature-scaled source mixing (the T5 / Pile recipe): each
    * (lang, source) group gets a quota ∝ n_g^α of a `total` budget, with
    * α = 0.5 — small groups are UP-sampled relative to their share (α = 1
    * is proportional, α = 0 uniform), the standard fix for a corpus
    * dominated by one crawl. Within a group selection is best-first
    * (n_chars DESC, doc_id ASC), like [[corpusMix]].
    *
    * Determinism across engines: the group weight is sqrt(n)·1e6 as an
    * integer micro (IEEE sqrt is correctly rounded — bit-identical in any
    * engine, unlike a general pow), the quota is integer floor division
    * `total·w DIV Σw`. Plan shape: one tiny group aggregate broadcast back
    * onto the corpus + one window shuffle keyed on the group — the same
    * two-exchange shape as corpusMix, at any corpus size.
    *
    * @return (doc_id, lang, source, n_chars, quota, rk)
    */
  def corpusMixTemperature(docs: DataFrame, total: Int = 100): DataFrame = {
    // pinned: the groups-count table is tiny but feeds BOTH the quota join
    // and the grand-total aggregate — unpinned, each branch re-scans the
    // corpus (column-pruned, but still a full pass at 100 TB)
    val weighted = graft.Caching.temp(docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long")))
    val tot = weighted.agg(sum("w").as("tot"))
    val quotas = weighted.crossJoin(broadcast(tot))
      .withColumn("quota", expr(s"CAST(($total * w) DIV tot AS BIGINT)"))
      .select("lang", "source", "quota")
    val byGroup = Window.partitionBy("lang", "source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.join(broadcast(quotas), Seq("lang", "source"))
      .withColumn("rk", row_number().over(byGroup).cast("long"))
      .filter(col("rk") <= col("quota"))
      .select("doc_id", "lang", "source", "n_chars", "quota", "rk")
  }

  def corpusMix(docs: DataFrame, samplePct: Int = 50, quota: Int = 20): DataFrame =
    docs.filter(sampleBucket(col("doc_id")) < samplePct)
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang", "source")
          .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= quota)
      .select("doc_id", "lang", "source", "n_chars", "rk")

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, the exponential-race form): document i draws key
    * `-ln(u_i) / w_i` with u_i an md5-derived uniform in (0,1], and the k
    * SMALLEST keys are a sample with inclusion probability ∝ w_i — the
    * "sample long documents more often" primitive of corpus mixing, where
    * [[sampleBucket]] is the unweighted rate filter and [[corpusMix]] the
    * best-first quota. u_i = (md5_32(id)+1)/2^32 is exact dyadic arithmetic
    * in any engine; the key rounds to 9 decimals before ranking (id
    * tie-break), so the sample — like every md5-derived sample here — is
    * independent of partitioning, retries, and engine. The rank is a
    * no-partition row_number, which Spark executes as WindowGroupLimit with
    * map-side top-k pruning: each partition forwards at most k rows.
    *
    * @return (id, weight, skey, rk) for the k sampled rows
    */
  def weightedSample(docs: DataFrame, idCol: String,
                     weight: Column, k: Int): DataFrame = {
    val u = (conv(substring(md5(concat(lit("ws:"), col(idCol).cast("string"))),
      1, 8), 16, 10).cast("double") + 1.0) / 4294967296.0
    val w = Window.orderBy(col("skey").asc, col(idCol).asc)
    docs.filter(weight > 0)
      .withColumn("weight", weight.cast("double"))
      .withColumn("skey", round(-log(u) / col("weight"), 9))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(idCol, "weight", "skey", "rk")
  }

  /** Context-length chunking with stride overlap — the other half of
    * sequence preparation next to [[packSequences]]: packing concatenates
    * short documents up to a budget, chunking splits long documents into
    * overlapping windows (chunk i starts at i·stride, length `chunkSize`
    * tokens; stride < chunkSize yields the overlap that keeps split
    * sentences in at least one chunk). Pure per-row explode — no shuffle at
    * all, scales linearly, and every output value (positions, lengths,
    * chunk hash) is integer/md5 arithmetic so the oracle is exact.
    *
    * @return (doc_id, chunk_id, start_tok, chunk_len, chunk_hash)
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    val toks = graft.functions.TextTokens.lowerSpaceTokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("toks"),
        size(toks).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok",
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(stride.toLong))))
      .withColumn("chunk",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunkSize)))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("long").as("chunk_id"),
        col("start_tok"),
        size(col("chunk")).cast("long").as("chunk_len"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  /** [[chunkDocuments]]'s boundaries with the chunk TEXT materialized —
    * the passage table a retrieval index is built over (RAG indexing:
    * passages, not whole documents, are the scoring unit). Same shuffle-free
    * per-row explode; text is the space-joined token window, so downstream
    * tokenization reproduces the chunk token-exactly.
    *
    * @return (doc_id, chunk_id, chunk_text)
    */
  def chunkTexts(docs: DataFrame, idCol: String, textCol: String,
                 chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    val toks = graft.functions.TextTokens.lowerSpaceTokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("toks"),
        size(toks).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("start_tok",
        explode(sequence(lit(0L), col("n_tokens") - 1, lit(stride.toLong))))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast("long").as("chunk_id"),
        concat_ws(" ",
          slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text"))
  }

  /** The corpus report: per-(lang, source) document/char/token totals plus
    * the exact-duplicate rate (distinct normalized fingerprints vs docs) —
    * the dashboard numbers a curation run is judged by. Two-level
    * aggregation instead of countDistinct-alongside-sums: grouping by
    * fingerprint first avoids Catalyst's Expand duplication of the input
    * (every row would flow through the aggregate twice), and both levels
    * are map-side combined. The second shuffle carries one row per distinct
    * fingerprint — i.e. the deduped corpus, already far smaller.
    *
    * @return (lang, source, n_docs, total_chars, total_tokens, n_unique,
    *         dup_rate)
    */
  def corpusStats(docs: DataFrame): DataFrame = {
    val nToks = size(graft.functions.TextTokens.lowerSpaceTokens(col("text")))
    val perFp = docs
      .groupBy(col("lang"), col("source"),
        TextStats.fingerprintCol(col("text")).as("fp"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).as("chars"),
        sum(nToks.cast("long")).as("toks"))
    perFp.groupBy("lang", "source")
      .agg(sum("n").as("n_docs"),
        sum("chars").as("total_chars"),
        sum("toks").as("total_tokens"),
        count(lit(1)).as("n_unique"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6))
  }

  /** Mixture-planning rollup: document/char/token totals at every
    * granularity a data-recipe planner reads — per (lang, source), per-lang
    * subtotal, grand total — in ONE pass via ROLLUP (a single Expand +
    * map-side-combined aggregate; 3 output granularities cost one shuffle,
    * not three jobs), each row annotated with its token share of the grand
    * total. Subtotal rows are labelled `<all>` (the corpus dims are
    * non-null), so the report is self-describing and engine-sortable. The
    * grand total is a 1-row broadcast scalar, not a corpus-wide window.
    *
    * @return (lang, source, n_docs, total_chars, total_tokens, token_share)
    */
  /** Snapshot diff — the dataset-versioning verdict between two corpus
    * snapshots: per document id, `added` (new only), `removed` (old only),
    * `changed` (both, fingerprints differ), `unchanged`. Content identity
    * is [[TextStats.fingerprintCol]] (formatting-jitter-stable), so a
    * re-crawl that only reflows whitespace reads as unchanged. One
    * doc_id-keyed full-outer join of two fingerprint projections — linear
    * in the snapshots, co-partitionable on doc_id at 100 TB, no
    * corpus-sized state anywhere.
    *
    * @return (doc_id, status) for every id in either snapshot
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val o = TextStats.fingerprint(oldDocs, idCol, textCol)
      .withColumnRenamed("fingerprint", "old_fp")
    val n = TextStats.fingerprint(newDocs, idCol, textCol)
      .withColumnRenamed("fingerprint", "new_fp")
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }

  def corpusRollup(docs: DataFrame): DataFrame = {
    val nToks = size(graft.functions.TextTokens.lowerSpaceTokens(col("text")))
      .cast("long")
    val base = docs.select(col("lang"), col("source"),
      length(col("text")).cast("long").as("chars"), nToks.as("toks"))
    val rolled = base.rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("total_chars"),
        sum("toks").as("total_tokens"))
      .select(coalesce(col("lang"), lit("<all>")).as("lang"),
        coalesce(col("source"), lit("<all>")).as("source"),
        col("n_docs"), col("total_chars"), col("total_tokens"))
    val total = base.agg(sum("toks").as("grand_toks"))
    rolled.crossJoin(broadcast(total))
      .withColumn("token_share",
        round(col("total_tokens").cast("double") / col("grand_toks"), 6))
      .drop("grand_toks")
  }

  /** Trainer batch-shape audit: padding waste of the three standard
    * batching strategies over the same (truncated) per-document token
    * counts — the number a pipeline owner reads before choosing how to
    * feed the corpus to the GPU:
    *
    *  - `fixed`    — every document padded to `maxLen` (the naive batch);
    *  - `bucketed` — length-bucketed batching, each document padded to the
    *                 next `bucket` boundary (the dynamic-batching middle
    *                 ground);
    *  - `packed`   — GPT-style concatenation into `packBudget`-token
    *                 sequences ([[packSequences]]' semantics: documents
    *                 chunk across sequence boundaries, so only the final
    *                 sequence carries padding).
    *
    * All-integer arithmetic (truncating DIV on non-negative operands, waste
    * in ppm), ONE map-side-combined aggregate over one corpus scan — the
    * three strategies unpivot from the same aggregate row, so the report is
    * 3 rows at any corpus size.
    *
    * @return (strategy, n_docs, used_tokens, slot_tokens, waste_ppm)
    */
  def paddingAudit(docs: DataFrame, idCol: String, textCol: String,
                   maxLen: Int = 256, bucket: Int = 32,
                   packBudget: Long = 2048): DataFrame = {
    val nToks = size(graft.functions.TextTokens.lowerSpaceTokens(col(textCol)))
    val a = docs.select(least(nToks.cast("long"), lit(maxLen.toLong)).as("n"))
      .filter(col("n") > 0)
      .agg(count(lit(1)).as("n_docs"), sum("n").as("used"),
        (count(lit(1)) * maxLen).as("slots_fixed"),
        sum(expr(s"((n + ${bucket - 1}) DIV $bucket) * $bucket"))
          .as("slots_bucketed"))
      .withColumn("slots_packed",
        expr(s"((used + ${packBudget - 1}) DIV $packBudget) * $packBudget"))
    a.select(explode(array(
        struct(lit("fixed").as("strategy"), col("n_docs"), col("used"),
          col("slots_fixed").as("slots")),
        struct(lit("bucketed").as("strategy"), col("n_docs"), col("used"),
          col("slots_bucketed").as("slots")),
        struct(lit("packed").as("strategy"), col("n_docs"), col("used"),
          col("slots_packed").as("slots")))).as("s"))
      .select(col("s.strategy").as("strategy"),
        col("s.n_docs").as("n_docs"),
        col("s.used").as("used_tokens"),
        col("s.slots").as("slot_tokens"),
        expr("((s.slots - s.used) * 1000000) DIV s.slots").as("waste_ppm"))
  }
}
