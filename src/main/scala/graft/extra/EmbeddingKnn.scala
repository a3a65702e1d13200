package graft.extra

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), for training-data similarity pipelines.
  *
  *  - [[bruteForce]]: exact cosine top-k. The query side broadcasts, the
  *    candidate scan is embarrassingly parallel, the per-query top-k is a
  *    window over rounded similarity (deterministic ties). Baseline + oracle.
  *  - [[signLsh]]: the scale path — bucket vectors by the sign pattern of
  *    their leading dimensions (a fixed-hyperplane LSH; deterministic, so the
  *    DuckDB oracle can reproduce it exactly). Probing cost drops by ~2^bits;
  *    at 100 TB swap the fixed hyperplanes for seeded random ones and/or an
  *    IVF coarse quantizer — the plan shape (bucket equi-join + windowed
  *    top-k) is unchanged, and it's a shuffle on bucket keys, never all-pairs.
  */
object EmbeddingKnn {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, _.cast("double"))

  /** Exact cosine top-k neighbors for the query vectors. */
  def bruteForce(emb: DataFrame, queryIds: Seq[Long], k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_vec"))
    val c = emb.select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_vec"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorOps.cosine(col("q_vec"), col("c_vec")), 6))
      .select("q_id", "c_id", "sim")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** kNN label transfer (pseudo-labeling / weak supervision): each query
    * vector takes the MAJORITY label among its k nearest neighbors in the
    * LABELED pool (query vectors are excluded from the pool — a query must
    * never vote for itself or for another unlabeled query). Ties break to
    * the smaller label, then votes include the tie-break rank so the output
    * is engine-exact. Candidate generation here is the brute-force twin for
    * oracle parity; at corpus scale swap in any bucketed generator from
    * this file (signLsh / ivfSeeded / pqKnn) — the voting tail is unchanged.
    *
    * @return (q_id, pred_label, votes) one row per query
    */
  def labelTransfer(emb: DataFrame, queryIds: Seq[Long], k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), asDouble(col("embedding")).as("q_vec"))
    val pool = emb.filter(!col("vec_id").isin(queryIds: _*))
      // labeled pool only: a null-labeled neighbor must neither occupy a kNN
      // slot nor win the vote (and null tie-ordering differs across engines)
      .filter(col("label").isNotNull)
      .select(col("vec_id").as("c_id"), asDouble(col("embedding")).as("c_vec"),
        col("label"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    val nn = pool.crossJoin(broadcast(q))
      .withColumn("sim", round(VectorOps.cosine(col("q_vec"), col("c_vec")), 6))
      .select("q_id", "c_id", "label", "sim")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    nn.groupBy("q_id", "label").agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("votes").desc, col("label").asc)))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
  }

  /** IVF (inverted-file) ANN — the production pattern behind FAISS-style
    * indexes: a KMeans coarse quantizer assigns every vector to one of
    * `nlist` cells; a query probes only its `nprobe` nearest cells. The
    * probe is a cluster-id equi-join (shuffle keyed on cell), never
    * all-pairs; recall/cost trades off via nprobe. Deterministic via seed.
    */
  def ivf(emb: DataFrame, queryIds: Seq[Long], k: Int = 5,
          nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("features", toVec(col("vec")))
    val model = new KMeans().setK(nlist).setSeed(42).setFeaturesCol("features")
      .fit(base)
    val assigned = model.transform(base)
      .select(col("vec_id"), col("vec"), col("prediction").as("cell"))
    val centers = model.clusterCenters.zipWithIndex
    // nprobe nearest cells per query vector (driver-side tiny math)
    val probeUdf = udf((q: Seq[Double]) => {
      centers.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < q.length && j < c.size) { val x = q(j) - c(j); d += x * x; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq
    })
    val q = assigned.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        explode(probeUdf(col("vec"))).as("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    assigned.select(col("vec_id").as("c_id"), col("vec").as("c_vec"), col("cell"))
      .join(broadcast(q), "cell")
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorOps.cosine(col("q_vec"), col("c_vec")), 6))
      .select("q_id", "c_id", "sim") // each candidate lives in exactly one cell → no dup pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Seeded-centroid cell assignment shared by [[ivfSeeded]] and
    * [[domainStats]]: centroids are the `nlist` vectors with the smallest
    * md5(vec_id) (content-independent pseudo-random sample, reproducible in
    * any engine with md5); every vector gets its ranked centroid distances
    * from ONE projection — the centroid table rides a single broadcast row
    * as an array<struct>, each vector sorts its nlist (cdist, cell_id)
    * structs in-row (lexicographic struct order IS the window's
    * cdist-then-cell_id tie rule) and posexplode numbers them. No iterative
    * fit, and — unlike the round-10 row_number window over the N×nlist
    * cross product — ZERO exchange: the generate+filter pipeline stays in
    * the scan stage, which is what keeps the whole IVF family (domainStats,
    * semanticDedup, ivfSeeded, clusterSample) shuffle-free over the corpus
    * at nlist=4096. Returns (vec_id, vec, cell_id, cdist, rn) where rn = 1
    * is the owning cell.
    */
  def ivfAssign(emb: DataFrame, nlist: Int = 16): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val cent = base
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(nlist)
      .select(col("vec_id").as("cell_id"), col("vec").as("cvec"))
    val centArr = cent.agg(collect_list(
      struct(col("cell_id"), col("cvec"))).as("cents"))
    base.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("vec"),
        posexplode(array_sort(transform(col("cents"), c =>
          struct(round(VectorOps.euclid(col("vec"), c("cvec")), 6).as("cdist"),
            c("cell_id").as("cell_id"))))).as(Seq("p", "r")))
      .select(col("vec_id"), col("vec"), col("r.cell_id").as("cell_id"),
        col("r.cdist").as("cdist"), (col("p") + 1).as("rn"))
  }

  /** Domain clustering report for corpus mixture balancing: every embedding
    * assigned to its seeded-centroid cell ([[ivfAssign]]), then one tiny
    * per-cell aggregate — cluster size, corpus share, and mean distance to
    * the centroid (a cohesion proxy; loose cells are candidates for
    * re-clustering or down-weighting). This is the embedding-space side of
    * data mixing: cells stand in for domains, shares feed the sampling
    * weights (as corpusMix does by source label). Share and mean use the
    * integer-micro truncating-division discipline so any engine lands on
    * identical values. The per-cell table is nlist rows — the final window
    * runs on one tiny partition.
    */
  def domainStats(emb: DataFrame, nlist: Int = 16): DataFrame = {
    val per = ivfAssign(emb, nlist).filter(col("rn") === 1)
      .groupBy("cell_id").agg(
        count(lit(1)).as("n_vecs"),
        sum(round(col("cdist") * 1e6).cast("long")).as("micros"))
    per
      .withColumn("total", sum("n_vecs").over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("cell_id"), col("n_vecs"),
        (expr("n_vecs * 1000000 DIV total").cast("double") / 1e6).as("share"),
        (expr("micros DIV n_vecs").cast("double") / 1e6).as("mean_cdist"))
  }

  /** IVF with a deterministic sampled coarse quantizer: centroids are the
    * `nlist` vectors with the smallest md5(vec_id) — a content-independent
    * pseudo-random sample, the classic cheap alternative to KMeans centroids
    * (FAISS's own docs note sampled centroids lose little recall at equal
    * nprobe). Everything downstream is the same inverted-file plan as [[ivf]]:
    * assignment is an argmin over the broadcast centroid table, the probe is
    * a cell equi-join, never all-pairs. Unlike the KMeans variant this is
    * reproducible outside Spark (no MLlib RNG), so the DuckDB oracle checks
    * it end to end; it also skips the iterative fit — at 100 TB the
    * assignment pass is the only full scan.
    */
  def ivfSeeded(emb: DataFrame, queryIds: Seq[Long], k: Int = 5,
                nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val ad = ivfAssign(emb, nlist)
    val cells = ad.filter(col("rn") === 1)
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"), col("cell_id"))
    val probe = ad.filter(col("rn") <= nprobe && col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("cell_id"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    cells.join(broadcast(probe), "cell_id")
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorOps.cosine(col("q_vec"), col("c_vec")), 6))
      .select("q_id", "c_id", "sim") // one cell per candidate → no dup pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication", 2023 —
    * public method description): cluster the embedding space coarsely, then
    * prune near-duplicates WITHIN each cluster only — the cluster bounds
    * the pairwise work, which is the whole trick that makes semantic dedup
    * tractable at web scale (all-pairs over the corpus is quadratic;
    * all-pairs inside a cell is quadratic in the cell, and nlist scales
    * cells down as the corpus grows). That scaling is REAL here, not
    * aspirational: the cell count is count-derived —
    * nlist = clamp(n DIV occupancyTarget, minNlist, maxNlist) — so mean
    * cell occupancy holds near the target and the within-cell pair
    * volume stays ~linear in the corpus (the sf10 century probe measured
    * the fixed-16-cell form at 77× cpu per 10× rows; occupancy-targeted
    * cells brought it back to ~linear). The same integer arithmetic runs
    * in the DuckDB twin, so cells — and therefore the kept set — remain
    * engine-reproducible at any SF. Centroids are the md5-order-first
    * maxNlist ids (one cheap TakeOrdered at any corpus size) ranked once
    * and sliced to nlist. maxNlist bounds the broadcast centroid array
    * AND the per-row assignment cost (nlist distance evals/row): past
    * ~maxNlist·occupancyTarget vectors, raise maxNlist with the per-row
    * budget or swap the flat argmin for a hierarchical/ANN centroid
    * assignment — the cell-local dedup downstream is unchanged.
    *
    * Keep rule: a vector is kept iff NO smaller-id vector in its cell has
    * rounded cosine ≥ `simThreshold` — the greedy keep-first-by-id pass of
    * the paper, deterministic without a connected-components round (a
    * duplicate CHAIN a–b–c prunes b and c even if cos(a,c) is below the
    * bar — same behavior as processing the cell in id order).
    *
    * @return (vec_id, cell_id, keep 1/0, max_prior_sim — the similarity to
    *         the closest smaller-id cell-mate at/above the bar, else NULL)
    */
  def semanticDedup(emb: DataFrame, minNlist: Int = 16,
                    simThreshold: Double = 0.5, maxNlist: Int = 256,
                    occupancyTarget: Int = 64): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val nlistDf = broadcast(base.agg(count(lit(1)).as("n"))
      .select(least(lit(maxNlist), greatest(lit(minNlist),
        expr(s"n DIV $occupancyTarget"))).as("nlist")))
    val wMd5 = Window.orderBy(md5(col("cell_id").cast("string")), col("cell_id"))
    val cent = base
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(maxNlist)
      .select(col("vec_id").as("cell_id"), col("vec").as("cvec"))
      .withColumn("rk", row_number().over(wMd5)) // ≤ maxNlist rows: tiny
      .crossJoin(nlistDf)
      .filter(col("rk") <= col("nlist"))
    val centArr = cent.agg(collect_list(
      struct(col("cell_id"), col("cvec"))).as("cents"))
    val ad = base.crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("vec"),
        element_at(array_sort(transform(col("cents"), c =>
          struct(round(VectorOps.euclid(col("vec"), c("cvec")), 6).as("cdist"),
            c("cell_id").as("cell_id")))), 1).as("r"))
      .select(col("vec_id"), col("vec"), col("r.cell_id").as("cell_id"))
    val a = ad.select(col("vec_id").as("a_id"), col("vec").as("a_vec"), col("cell_id"))
    val b = ad.select(col("vec_id").as("b_id"), col("vec").as("b_vec"), col("cell_id"))
    val dup = a.join(b, Seq("cell_id"))
      .filter(col("b_id") < col("a_id"))
      .withColumn("sim", round(VectorOps.cosine(col("a_vec"), col("b_vec")), 6))
      .filter(col("sim") >= simThreshold)
      .groupBy(col("a_id").as("vec_id"))
      .agg(max("sim").as("max_prior_sim"))
    ad.select("vec_id", "cell_id")
      .join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        col("max_prior_sim").isNull.cast("long").as("keep"),
        col("max_prior_sim"))
  }

  /** Int8-quantized ANN with exact rerank — the bandwidth-bound scale path
    * ([[Quantize]]'s 4× storage cut made operational): candidate scoring
    * runs entirely on int8 codes (integer dot product + two per-vector
    * floats; cos ≈ s_a·s_b·Σq_aq_b / (‖q_a‖s_a·‖q_b‖s_b)), the float
    * vectors are touched only for the `k·overfetch` survivors, which are
    * re-scored exactly. In a real store the codes column is the scan table
    * and the float column a late-materialized fetch; here both ride the
    * same row for plan simplicity. Deterministic end to end, so the DuckDB
    * oracle reproduces ranks exactly.
    */
  def int8Rerank(emb: DataFrame, queryIds: Seq[Long], k: Int = 5,
                 overfetch: Int = 4): DataFrame = {
    val quant = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("scale", Quantize.scaleOf(col("vec")))
      .withColumn("qv", Quantize.quantize(col("vec"), col("scale")))
      // floored like scaleOf: an all-zero vector has qnorm 0 and the approx
      // division would yield NaN, which sorts ABOVE real scores descending —
      // the zero vector would hijack an arank slot in every candidate list
      .withColumn("qnorm", greatest(sqrt(aggregate(col("qv"), lit(0L),
        (a, x) => a + x.cast("long") * x).cast("double")) * col("scale"),
        lit(1e-12)))
    val q = quant.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("scale").as("q_scale"), col("qnorm").as("q_norm"),
        col("vec").as("q_vec"))
    val c = quant.select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
      col("scale").as("c_scale"), col("qnorm").as("c_norm"),
      col("vec").as("c_vec"))
    val wa = Window.partitionBy("q_id").orderBy(col("approx").desc, col("c_id").asc)
    val we = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("dot_int", VectorOps.int8Dot(col("q_qv"), col("c_qv")))
      .withColumn("approx", round(col("q_scale") * col("c_scale") * col("dot_int")
        / (col("q_norm") * col("c_norm")), 6))
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= k * overfetch)
      .withColumn("sim", round(VectorOps.cosine(col("q_vec"), col("c_vec")), 6))
      .select("q_id", "c_id", "sim")
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
  }

  /** Sign-pattern bucket key over the first `bits` dimensions (public: the
    * dedup pipeline reuses the same bucketing as its pair prefilter).
    */
  def bucketExpr(vecCol: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    concat_ws("", (0 until bits).map(i =>
      when(element_at(vecCol, i + 1) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed cosine top-k: candidates restricted to the query's bucket. */
  def signLsh(emb: DataFrame, queryIds: Seq[Long], k: Int = 5, bits: Int = 8): DataFrame = {
    val withBucket = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("bucket", bucketExpr(col("vec"), bits))
    val q = withBucket.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"), col("bucket"))
    val c = withBucket
      .select(col("vec_id").as("c_id"), col("vec").as("c_vec"), col("bucket"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("sim", round(VectorOps.cosine(col("q_vec"), col("c_vec")), 6))
      .select("q_id", "c_id", "sim")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Recall@k audit of an approximate neighbor list against the exact one —
    * the quality dial every ANN deployment needs on a dashboard: recall is
    * THE tunable/observable of the accelerated paths (bits/tables for LSH,
    * nprobe for IVF, overfetch for int8/PQ), and this makes it a query over
    * the engine's own operators rather than an offline notebook. Both
    * inputs are (q_id, c_id, …) ranked lists (any generator in this file);
    * per query: hits = |exact ∩ approx|, recall = hits/k as an exact
    * integer-micro division, so the report is engine-reproducible. Plan
    * shape: both lists are k-per-query sized — the join and aggregate move
    * O(queries · k) rows regardless of corpus size.
    *
    * @return (q_id, n_exact, n_hit, recall) — one row per exact-side query
    */
  def annRecall(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact.select(col("q_id"), col("c_id"))
      .join(approx.select(col("q_id"), col("c_id"), lit(1L).as("hit")),
        Seq("q_id", "c_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        expr(s"CAST((n_hit * 1000000) DIV $k AS DOUBLE) / 1e6"))

  /** Hard-negative mining for contrastive training: the top-k most SIMILAR
    * candidates that are NOT near-duplicates of the query — near-hits make
    * the best negatives, but an unlabeled near-dup is a false negative that
    * poisons the loss, so the near-dup CLUSTER (connected components over
    * the verified pair graph, CorpusOps.dedupClusters) is excluded, not just
    * the exact match. Overfetch covers the excluded slots; ranks are
    * recomputed after exclusion so output lists are dense. Plan shape: the
    * cluster-label table is component-count-sized → broadcast twice (query
    * and candidate side) onto the ANN candidate lists; at 100 TB swap
    * [[bruteForce]] for any of the accelerated paths — the exclusion join is
    * unchanged.
    */
  def hardNegatives(emb: DataFrame, clusters: DataFrame, queryIds: Seq[Long],
                    k: Int = 5, overfetch: Int = 4): DataFrame = {
    val cand = bruteForce(emb, queryIds, k * overfetch)
    val ql = clusters.select(col("doc_id").as("q_id"), col("cluster_id").as("q_cluster"))
    val cl = clusters.select(col("doc_id").as("c_id"), col("cluster_id").as("c_cluster"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id").asc)
    cand
      .join(broadcast(ql), Seq("q_id"), "left")
      .join(broadcast(cl), Seq("c_id"), "left")
      .filter(col("q_cluster").isNull || col("c_cluster").isNull ||
        col("q_cluster") =!= col("c_cluster"))
      .select("q_id", "c_id", "sim")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Squared euclidean as a left-associated fold — zip_with + aggregate stay
    * in codegen, and the ascending-index fold order matches an explicit
    * left-associated SQL term chain, so the value is bit-identical across
    * engines (which [[pqKnn]]'s oracle relies on).
    */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Product-quantization ANN with an asymmetric-distance (ADC) scan — the
    * memory path for billion-vector stores (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): each vector is
    * stored as `m` codebook indices (8 subspaces × 8 dims over the 64-dim
    * fixture, 16 centroids each → 8 bytes/vector vs 256 for floats). The
    * codebook is a deterministic md5-ordered row sample (same trick as
    * [[ivfSeeded]]'s coarse centroids — k-means would sharpen it but costs
    * determinism), so codes and ranks are engine-reproducible.
    *
    * Scan shape: encode is one broadcast join (128 codebook rows) + a
    * per-(vector, subspace) argmin; the query side precomputes its m×ksub
    * centroid-distance table (tiny, broadcast); a candidate's approximate
    * distance is then the SUM OF TABLE LOOKUPS keyed by its codes — no float
    * vector is touched during the scan. Distances travel as integer micros
    * (round(d²·1e6)), so the ADC total is exact and summation-order-free.
    * At 100 TB the codes table is the only thing scanned: 8 bytes/row versus
    * 256, and the whole pipeline is one broadcast join + one top-k window.
    */
  def pqKnn(emb: DataFrame, queryIds: Seq[Long], k: Int = 5,
            m: Int = 8, subDim: Int = 8, ksub: Int = 16): DataFrame = {
    val base = emb.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val ord = Seq(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
    // j = 1-based codebook index in the same md5 order as the sample
    val cent = base.orderBy(ord: _*).limit(ksub)
      .withColumn("j", row_number().over(Window.orderBy(ord: _*)))
    def subSlices(vc: org.apache.spark.sql.Column) = array((0 until m).map(i =>
      struct(lit(i).as("sub"), slice(vc, i * subDim + 1, subDim).as("svec"))): _*)
    val centSub = cent.select(col("j"), explode(subSlices(col("vec"))).as("e"))
      .select(col("e.sub").as("sub"), col("j"), col("e.svec").as("cvec"))
    val vecSub = base.select(col("vec_id"), explode(subSlices(col("vec"))).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.svec").as("svec"))
    val dists = vecSub.join(broadcast(centSub), "sub")
      .withColumn("dm", round(sqDist(col("svec"), col("cvec")) * 1e6).cast("long"))
    val ew = Window.partitionBy("vec_id", "sub").orderBy(col("dm").asc, col("j").asc)
    val codes = dists
      .withColumn("rn", row_number().over(ew))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("c_id"), col("sub"), col("j"))
    val qtab = dists.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"), col("sub"), col("j"), col("dm"))
    val w = Window.partitionBy("q_id").orderBy(col("total").asc, col("c_id").asc)
    codes.join(broadcast(qtab), Seq("sub", "j"))
      .groupBy(col("q_id"), col("c_id"))
      .agg(sum("dm").as("total"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("adist", round(sqrt(col("total") / 1e6), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "adist", "rank")
  }

  /** Margin-based bitext mining (the CCMatrix/LASER ratio-margin criterion,
    * Artetxe & Schwenk): candidate pair (x, y) across the two pools scores
    * `cos(x,y)` normalized by the mean cosine of each side's k nearest
    * neighbors in the OTHER pool — a pair is mined only when it stands out
    * from both local neighborhoods (raw cosine thresholds can't do this:
    * hubs clear them everywhere). Pools here are the embedding fixture's
    * even/odd label halves standing in for the two languages.
    *
    * Engine-exact integer arithmetic: cosines travel as micros, both
    * neighborhood means stay SUMS (order-free integer aggregation), and
    * `margin_ppm = cos_micro·2k·10^6 DIV (fwd_sum + bwd_sum)` — both
    * engines truncate positive integer division identically, and the
    * pair filter `cos_micro > 0` keeps the numerator positive. One
    * A×B cosine matrix feeds BOTH direction top-ks (cosine is symmetric),
    * so the mining pass is one broadcast join + two windows + two
    * map-side-combined sums. At corpus scale swap the exact matrix for any
    * bucketed candidate generator in this file (signLsh / ivfSeeded) on
    * each direction — the margin tail is unchanged.
    *
    * @return (a_id, b_id, cos_micro, margin_ppm) — per source vector its
    *         best-margin target, kept above `minMarginPpm`
    */
  def bitextMine(emb: DataFrame, k: Int = 4,
                 minMarginPpm: Long = 1000000L): DataFrame = {
    val a = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("a_id"), asDouble(col("embedding")).as("a_vec"))
    val b = emb.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("b_id"), asDouble(col("embedding")).as("b_vec"))
    val sims = a.crossJoin(broadcast(b))
      .withColumn("cos_micro",
        VectorOps.round0(VectorOps.cosine(col("a_vec"), col("b_vec")) * 1e6)
          .cast("long"))
      .select("a_id", "b_id", "cos_micro")
    bitextMarginTail(sims, k, minMarginPpm)
  }

  /** The ratio-margin tail shared by [[bitextMine]] and
    * [[bitextMineLsh]]: direction top-ks, neighborhood sums, the
    * truncating integer margin, forward best-by-margin. Input is any
    * (a_id, b_id, cos_micro) candidate matrix — exact or bucketed.
    *
    * The BRANCHING shape (fwd/bwd as aggregate+join, not windowed sums) is
    * deliberate and measured, not an accident to "simplify": each branch
    * reads only ONE of the rank columns, so column pruning deletes the
    * other Window from that branch's plan and the rank filter becomes a
    * map-side WindowGroupLimit — each neighborhood sum touches ~k rows per
    * id, never the full matrix. The tempting linear rewrite (fwd_sum /
    * bwd_sum as full-partition windowed sums over the rank windows'
    * partitioning) defeats BOTH optimizations — every candidate row flows
    * through five Window passes and two extra full-matrix exchanges;
    * measured 2.7→7.5s summed stage time on the sf0.1 exact miner
    * (round-14 continuation A/B) for flat wall.
    */
  private def bitextMarginTail(sims: DataFrame, k: Int,
                               minMarginPpm: Long): DataFrame = {
    val wF = Window.partitionBy("a_id")
      .orderBy(col("cos_micro").desc, col("b_id").asc)
    val wB = Window.partitionBy("b_id")
      .orderBy(col("cos_micro").desc, col("a_id").asc)
    val ranked = sims
      .withColumn("rf", row_number().over(wF))
      .withColumn("rb", row_number().over(wB))
    val fwd = ranked.filter(col("rf") <= k)
      .groupBy("a_id").agg(sum("cos_micro").as("fwd_sum"))
    val bwd = ranked.filter(col("rb") <= k)
      .groupBy("b_id").agg(sum("cos_micro").as("bwd_sum"))
    val wM = Window.partitionBy("a_id")
      .orderBy(col("margin_ppm").desc, col("b_id").asc)
    ranked.filter(col("rf") <= k && col("cos_micro") > 0)
      .join(fwd, Seq("a_id")).join(bwd, Seq("b_id"))
      .filter(col("fwd_sum") + col("bwd_sum") > 0)
      .withColumn("margin_ppm",
        expr(s"(cos_micro * ${2 * k} * 1000000) DIV (fwd_sum + bwd_sum)"))
      .withColumn("rk", row_number().over(wM))
      .filter(col("rk") === 1 && col("margin_ppm") >= minMarginPpm)
      .select("a_id", "b_id", "cos_micro", "margin_ppm")
  }

  /** Bucketed bitext mining — [[bitextMine]]'s registered SCALE path (the
    * swap the exact twin's scaladoc promises): the A×B cosine matrix is
    * replaced by a MULTI-TABLE sign-LSH candidate join
    * (stride-`bitsPerTable` anchors — a single wide sign pattern has
    * vanishing recall, T independent narrow tables give 1-(1-p^b)^T), so
    * candidates are a shuffle keyed on (table, bucket) — never all-pairs —
    * deduped with one distinct, then scored exactly. The compared bucket
    * width is ADAPTIVE (one more sign bit per pool doubling, derived from
    * the pool counts with exact integer arithmetic the DuckDB twin
    * mirrors — see the body comment), because any FIXED band is quadratic
    * in pool size. The margin tail is IDENTICAL ([[bitextMarginTail]]);
    * neighborhood top-ks and sums run over the candidate set, so the
    * criterion degrades gracefully: a mined pair stands out from its
    * CANDIDATE neighborhoods. [[bitextRecall]] audits exactly that swap —
    * how much of the exact mined set the bucketed run recovers (floor
    * spec-gated in DedupSpec).
    */
  def bitextMineLsh(emb: DataFrame, k: Int = 4,
                    minMarginPpm: Long = 1000000L, bitsPerTable: Int = 3,
                    tables: Int = 12, maxBits: Int = 12,
                    targetLog2: Int = 5): DataFrame = {
    val a = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("a_id"), asDouble(col("embedding")).as("a_vec"))
    val b = emb.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("b_id"), asDouble(col("embedding")).as("b_vec"))
    // ADAPTIVE band width: a fixed-width sign band makes the bucket join
    // quadratic in pool size (candidates/table ≈ n²/2^bits — the sf10
    // century probe's finding), so the COMPARED prefix length grows by
    // one bit per pool doubling, holding expected bucket occupancy near
    // 2^targetLog2: blen = clamp(floor(log2(maxPool)) - targetLog2,
    // bitsPerTable, maxBits). floor(log2(n)) is computed as
    // length(bin(n)) - 1 — exact integer arithmetic, so the DuckDB twin
    // derives the identical width from the same counts (no libm). Table
    // t anchors at dim t·bitsPerTable+1 (at the minimum width this is
    // exactly the classic signLshTableDims layout) and extends to
    // maxBits sign dims; adjacent tables overlap once blen >
    // bitsPerTable — slightly correlated, still maxBits-dim-bounded. The
    // bit supply caps at maxBits (embedding_dim ≥
    // (tables-1)·bitsPerTable + maxBits): past pools of
    // ~2^(maxBits+targetLog2) rows, raise maxBits/tables with the
    // dimension budget, or expand the bit supply with a fixed Gaussian
    // projection (the mediaEmbedding pattern) before banding.
    require((tables - 1) * bitsPerTable + maxBits <= 64,
      s"band layout exceeds the embedding dimension budget")
    // blen is capped by the pools' ACTUAL embedding width too (last
    // table's bit supply = dim - (tables-1)·stride): comparing past it
    // would compare constant filler bits and quietly stop halving bucket
    // occupancy per added bit. 64-dim pools cap at 31 ≥ maxBits = 12, so
    // the DuckDB twin's count-only formula remains identical arithmetic.
    val blenDf = broadcast(
      a.agg(count(lit(1)).as("na"), min(size(col("a_vec"))).as("da"))
        .crossJoin(b.agg(count(lit(1)).as("nb"), min(size(col("b_vec"))).as("db")))
        .select(greatest(lit(bitsPerTable), least(
          lit(maxBits),
          least(col("da"), col("db")) - (tables - 1) * bitsPerTable,
          greatest(lit(bitsPerTable),
            length(bin(greatest(col("na"), col("nb")))) - 1 - targetLog2)))
          .as("blen")))
    def keys(vecCol: String) = explode(array(
      (0 until tables).map { t =>
        val dims = t * bitsPerTable + 1 to t * bitsPerTable + maxBits
        struct(lit(t).as("tbl"),
          concat(dims.map(i =>
            // unread past the vector's end (ANSI element_at throws); the
            // compared prefix never reaches the filler
            when(lit(i) <= size(col(vecCol)),
              when(element_at(col(vecCol), i) >= 0, "1").otherwise("0"))
              .otherwise("0")): _*)
            .as("bucket"))
      }: _*))
    val ka = a.select(col("a_id"), keys("a_vec").as("k"))
      .crossJoin(blenDf)
      .select(col("a_id"), col("k.tbl").as("tbl"),
        expr("substring(k.bucket, 1, blen)").as("bucket"))
    val kb = b.select(col("b_id"), keys("b_vec").as("k"))
      .crossJoin(blenDf)
      .select(col("b_id"), col("k.tbl").as("tbl"),
        expr("substring(k.bucket, 1, blen)").as("bucket"))
    val cand = ka.join(kb, Seq("tbl", "bucket"))
      .select("a_id", "b_id").distinct()
    val sims = cand.join(a, "a_id").join(b, "b_id")
      .withColumn("cos_micro",
        VectorOps.round0(VectorOps.cosine(col("a_vec"), col("b_vec")) * 1e6)
          .cast("long"))
      .select("a_id", "b_id", "cos_micro")
    bitextMarginTail(sims, k, minMarginPpm)
  }

  /** One-row recall audit of a bucketed bitext run against the exact one —
    * the [[annRecall]] pattern applied to mined PAIRS: a hit is an
    * (a_id, b_id) pair mined by both. Both inputs are mined-pair tables
    * (one row per source vector), so the join and aggregate move
    * O(sources) rows regardless of corpus size.
    *
    * At corpus scale the EXACT side is the expensive input (it exists only
    * for this audit): run both miners over a deterministic source-side
    * sample first — filter pool A by
    * [[CorpusOps.sampleBucket]]`(col("vec_id")) < pct` and pass the same
    * sampled frame to both — the recall estimate is unbiased, the exact
    * A×B work shrinks by the sample rate, and the md5 bucket keeps the
    * audited slice identical across runs and engines. The registered query
    * audits the full fixture, where exact is affordable.
    *
    * PRECONDITION (ADVICE r17): each input must carry DISTINCT
    * (a_id, b_id) pairs — the union + max() membership recovery below (and
    * the unchanged DuckDB oracle twin, which still counts raw rows) equals
    * the old join+count form only then. Both registered miners guarantee
    * it via their rk === 1 best-match tails; a future caller with
    * duplicate pairs would silently diverge from the oracle.
    *
    * @param exact  exact miner pairs, one row per (a_id, b_id)
    * @param approx approximate miner pairs, one row per (a_id, b_id)
    * @return (n_exact, n_approx, n_hit, recall) — recall as the
    *         integer-micro division of hits over the exact set
    */
  def bitextRecall(exact: DataFrame, approx: DataFrame): DataFrame =
    // Single-consumption shape (round 17): the former left-join +
    // broadcast-count form consumed `approx` TWICE (probe side + the count
    // agg inside the broadcast build), so the whole bucketed-miner
    // pipeline behind it EXECUTED twice per audit — and the audit plan
    // embedded it twice (the 101-Exchange bitext_recall plan; driver
    // planning time scaled with it). A union + one (a_id, b_id)-keyed
    // aggregate reads each miner once: per side a pair appears at most
    // once (one row per source vector), so max() recovers the membership
    // flags and the global sums are exactly the old counts —
    // n_hit = |exact ∩ approx| via sum(e·x). The empty-exact guard
    // reproduces the old shape's zero-row output (its groupBy collapsed
    // on an empty joined frame); DIV-by-zero is unreachable past it.
    exact.select(col("a_id"), col("b_id"),
        lit(1L).as("e"), lit(0L).as("x"))
      .unionAll(approx.select(col("a_id"), col("b_id"),
        lit(0L).as("e"), lit(1L).as("x")))
      .groupBy("a_id", "b_id")
      .agg(max("e").as("e"), max("x").as("x"))
      .agg(sum("e").as("n_exact"), sum("x").as("n_approx"),
        sum(col("e") * col("x")).as("n_hit"))
      .filter(col("n_exact") > 0)
      .select(col("n_exact"), col("n_approx"), col("n_hit"),
        expr("CAST((n_hit * 1000000) DIV n_exact AS DOUBLE) / 1e6").as("recall"))
}
