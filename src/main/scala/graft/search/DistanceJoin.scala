package graft.search

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-sketch kNN — the Spark version of danae's R-tree nearest-neighbor
  * search over column vectors (search/content_search.py:72-116 +
  * search/index.py:37-43), including the reference's kth-distance
  * normalization (content_search.py:88-96: the L-th smallest NON-ZERO
  * distance, floored at 1e-12) and exp-decay similarity
  * `sim = w * exp(-decay * dist / kth)` (content_search.py:104).
  *
  * Plan shape: the query side is a handful of rows (one per query column) —
  * broadcast it; the candidate side is the sketch table partitioned by
  * col_type. Distance is a codegen'd native expression, ranking a window per
  * query column. Distances are rounded to 6 decimals BEFORE ranking so the
  * DuckDB oracle ranks identically; ties break on (dataset_id, col_name).
  * At lake scale (millions of columns) swap the per-type brute-force join for
  * an LSH bucket join — same interface, the ranked-list schema is unchanged.
  */
object DistanceJoin {

  /** 6-decimal pin for LARGE-magnitude distances (epoch-scale sketch
    * dimensions put dist near 2·10⁹): an explicit ×1e6 IEEE multiply, round
    * to the integer micro, divide back — the same op sequence the DuckDB
    * oracle runs. Spark's round(x, 6) rounds the double's EXACT binary
    * expansion while DuckDB's round multiplies by 1e6 first; past ~10⁹ the
    * two disagree by one micro whenever the product lands on a
    * representable .5 (the last sf1.0 fp-noise source on dist/kth).
    * Bit-exact while |x| ≲ 9·10⁹ (2⁵³ at micro scale).
    */
  private def round6micro(c: org.apache.spark.sql.Column) =
    VectorOps.round0(c * lit(1e6)).cast("long").cast("double") / lit(1e6)

  /** Per-query-column ranked candidate lists.
    *
    * @param sketch  sketch table (dataset_id, col_name, col_type, vector)
    * @param queryId dataset whose columns are the query
    * @param m       neighbors kept per query column (danae M, UI default 100)
    * @param l       rank of the normalizing distance (danae L, UI default 50)
    * @param decay   exp decay rate (content_search.py:28, default 0.01)
    * @param queryCols restrict the QUERY projection to these columns (the
    *                UI's column selection). The index side is never filtered:
    *                the reference trains on every column and a selection only
    *                narrows which query columns search (ui/ui.py:299-312).
    * @param localQuery the query dataset's sketch rows as a LocalRelation
    *                ([[Sketches.queryLocal]]): with it, the query-side
    *                broadcast builds jobless on the warm serving path
    *                instead of paying a scan-the-index job per request.
    *                None (ad-hoc callers) filters the index as before.
    */
  def knn(sketch: DataFrame, queryId: String, m: Int = 100, l: Int = 50,
          decay: Double = 0.01, queryCols: Option[Seq[String]] = None,
          localQuery: Option[DataFrame] = None): DataFrame = {
    val query = queryProjection(localQuery.getOrElse(
      sketch.filter(col("dataset_id") === queryId)), queryCols)
    // The index contains the query dataset's own columns too
    // (content_search.py:215-253 trains on every dataset): they occupy rank
    // positions and can BE the kth distance (a sibling column at non-zero
    // distance), and are only excluded at candidate level — so rank/kth are
    // computed over everything and self rows drop at the end.
    val cands = sketch
      .select(col("dataset_id").as("c_dataset"), col("col_name").as("c_col"),
        col("col_type"), col("vector").as("c_vec"))
    // Two metrics, as in the reference: candidate SELECTION follows the
    // R-tree's nearest order — rectangle min-distance for Spatial bboxes
    // (index.py:37-43) — while SCORING (dist/kth/sim) is always euclidean on
    // the sketch vector (content_search.py:58-70). For non-spatial types the
    // two coincide.
    val joined = joinQuery(cands, query, localQuery.isDefined)
      .withColumn("dist", round6micro(VectorOps.euclid(col("q_vec"), col("c_vec"))))
      .withColumn("sel_dist", when(col("col_type") === "Spatial",
        round6micro(VectorOps.rectMinDist(col("q_vec"), col("c_vec"))))
        .otherwise(col("dist")))
      .drop("q_vec", "c_vec")
    rankAndScore(joined, m, l, decay)
      .filter(col("c_dataset") =!= queryId)
  }

  /** The query side of a search: the query dataset's sketch rows, optionally
    * restricted to a column selection (query side ONLY — see [[knn]]).
    */
  private def queryProjection(base: DataFrame,
                              queryCols: Option[Seq[String]]): DataFrame = {
    val sel = queryCols.fold(base)(cs => base.filter(col("col_name").isin(cs: _*)))
    sel.select(col("col_name").as("q_col"), col("col_type"), col("vector").as("q_vec"))
  }

  /** The per-type many-to-many pairing of candidate columns with query
    * columns. Batch path (`local = false`): a broadcast hash join on
    * col_type. Warm serving path (`local = true`, the query projection is a
    * LocalRelation): the query rows are embedded as an exploded LITERAL —
    * col_type → array<struct<q_col, q_vec>> — because on this runtime a
    * broadcast build is a Spark JOB even over a LocalRelation
    * (tools/BcProbe), and the request path is driver-latency-bound.
    * explode(element_at(map, col_type)) yields no rows for a type with no
    * query columns — exactly the inner join's drop — and the same
    * (q_col, q_vec) values pair with each candidate row, so every
    * downstream distance/rank/kth value is bit-identical (oracle-locked).
    */
  private def joinQuery(cands: DataFrame, query: DataFrame,
                        local: Boolean): DataFrame = {
    lazy val rows = query.collect() // LocalRelation when local: jobless
    if (!local || rows.isEmpty) cands.join(broadcast(query), "col_type")
    else {
      val arms = rows.groupBy(_.getString(1)).toSeq.map { case (ct, rs) =>
        lit(ct) -> array(rs.map { r =>
          struct(lit(r.getString(0)).as("q_col"),
            typedLit(r.getSeq[Double](2).toSeq).as("q_vec"))
        }: _*)
      }
      val qmap = map(arms.flatMap { case (k, v) => Seq(k, v) }: _*)
      cands.withColumn("__q", explode(element_at(qmap, col("col_type"))))
        .withColumn("q_col", col("__q.q_col"))
        .withColumn("q_vec", col("__q.q_vec"))
        .drop("__q")
    }
  }

  /** Shared tail of both kNN paths: rank per query column, kth-distance
    * normalization, exp-decay similarity. Input: (q_col, c_dataset, c_col,
    * col_type, dist) candidate rows; an optional `sel_dist` column carries a
    * separate SELECTION metric (the R-tree nearest order) — the top-m
    * survivors are picked by it, then ranks/kth/sims always follow `dist`
    * (the reference re-scores the R-tree's M nearest with euclidean,
    * content_search.py:78-96).
    */
  private[search] def rankAndScore(joined: DataFrame, m: Int, l: Int,
                                   decay: Double): DataFrame = {
    val selected =
      if (!joined.columns.contains("sel_dist")) joined
      else {
        val selW = Window.partitionBy("q_col")
          .orderBy(col("sel_dist").asc, col("c_dataset").asc, col("c_col").asc)
        joined.withColumn("sel_rank", row_number().over(selW))
          .filter(col("sel_rank") <= m)
          .drop("sel_rank", "sel_dist")
      }
    val rankW = Window.partitionBy("q_col")
      .orderBy(col("dist").asc, col("c_dataset").asc, col("c_col").asc)
    val ranked = selected.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= m)

    // kth (content_search.py:88-96): take the sorted distance at position
    // min(L, n) COUNTING ZEROS, then advance past zeros — equivalently the
    // smallest non-zero distance at rank >= min(L, n); 1e-12 when none.
    // (NOT "the L-th smallest non-zero" — zeros occupy ranks.)
    // Both n (= max rank = partition size) and the conditional min are
    // whole-partition window aggregates over the SAME q_col partitioning as
    // the ranking itself — no extra exchange, and none of the broadcast
    // joins whose build subtrees would each re-execute the ranked pipeline
    // as their own Spark job (measured: 2 jobs + duplicate window work per
    // search before this was folded in).
    val part = Window.partitionBy("q_col")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked
      .withColumn("n_cand", count(lit(1)).over(part))
      .withColumn("kth", coalesce(
        min(when(col("rank") >= least(lit(l), col("n_cand")) && col("dist") > 0,
          col("dist"))).over(part),
        lit(1e-12)))
      .drop("n_cand")
      .withColumn("sim", round(exp(-lit(decay) * col("dist") / col("kth")), 6))
  }

  /** Deterministic component i (1-based) of random-projection hyperplane t:
    * uniform in [-1, 1), derived from md5("rp:t:i") — content-independent,
    * identical in any engine that has md5, so the DuckDB oracle reproduces
    * the buckets bit for bit (same trick as Dedup's MinHash perms). A
    * uniform component family is a valid Euclidean-LSH projection (vs
    * MLlib's Gaussian draws); what matters is that the hyperplanes are fixed
    * and shared by every row.
    */
  private[search] def rUnit(t: Int, i: Int): org.apache.spark.sql.Column =
    conv(substring(md5(lit(s"rp:$t:$i")), 1, 8), 16, 10).cast("double") /
      lit(2147483648.0) - lit(1.0)

  /** LSH-accelerated kNN — the planner's scale path for J1 (SURVEY §7.9):
    * `numHashTables` fixed random projections; a row's bucket in table t is
    * `floor(dot(vector, r_t) / bucketLength)`, candidates are rows sharing
    * any (table, bucket, col_type) with a query row — a bucket equi-join,
    * never the per-type cross product — then the exact distance, rank, kth
    * and sim pipeline runs only on candidates. Same output schema as [[knn]].
    * The projections are md5-derived (see [[rUnit]]) rather than MLlib's
    * seeded Gaussians, so the pipeline is engine-reproducible and needs no
    * fit step or per-type driver loop.
    * Approximation caveat: distances of surviving pairs are exact, and the
    * query dataset's own columns flow through rank/kth exactly like [[knn]]
    * (self rows occupy rank positions, can be the kth distance, and drop
    * only at candidate level) — but rank and kth are computed over the
    * REDUCED candidate set, so when recall < 1 the kth normalizer (and
    * hence sims) can differ from brute force. That is inherent to LSH
    * pruning, not an implementation detail.
    */
  def knnLsh(sketch: DataFrame, queryId: String, m: Int = 100, l: Int = 50,
             decay: Double = 0.01, bucketLength: Double = 2.0,
             numHashTables: Int = 3, dim: Int = 7): DataFrame = {
    // (table, bucket) pairs per row; a vector shorter than `dim` contributes
    // 0 for its missing dimensions (try_element_at → null → coalesce), so
    // short vectors still bucket on the hyperplane prefix they span — the
    // SQL twin's coalesce(vec[i], 0.0) does the same
    val tables = (0 until numHashTables).map { t =>
      val dot = (1 to dim).map(i =>
        coalesce(try_element_at(col("vector"), lit(i)), lit(0.0)) * rUnit(t, i))
        .reduce(_ + _)
      struct(lit(t).as("t"), floor(dot / lit(bucketLength)).as("bucket"))
    }
    val withB = sketch
      .select(col("dataset_id"), col("col_name"), col("col_type"),
        explode(array(tables: _*)).as("tb"))
      .select(col("dataset_id"), col("col_name"), col("col_type"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val qb = withB.filter(col("dataset_id") === queryId)
      .select(col("col_type"), col("t"), col("bucket"), col("col_name").as("q_col"))
    val pairs = withB.join(broadcast(qb), Seq("col_type", "t", "bucket"))
      .select(col("q_col"), col("dataset_id").as("c_dataset"),
        col("col_name").as("c_col"), col("col_type"))
      .distinct()
    val qv = sketch.filter(col("dataset_id") === queryId)
      .select(col("col_name").as("q_col"), col("vector").as("q_vec"))
    val cv = sketch.select(col("dataset_id").as("c_dataset"),
      col("col_name").as("c_col"), col("vector").as("c_vec"))
    val joined = pairs
      .join(cv, Seq("c_dataset", "c_col"))
      .join(broadcast(qv), Seq("q_col"))
      .withColumn("dist", round6micro(VectorOps.euclid(col("q_vec"), col("c_vec"))))
      .drop("q_vec", "c_vec")
    rankAndScore(joined, m, l, decay)
      .filter(col("c_dataset") =!= queryId)
  }

  /** Complete bipartite edge set for the candidate datasets the kNN step
    * discovered — the reference's "random access": for every discovered
    * candidate, edges cover ALL same-type (query col, candidate col) pairs,
    * computing distances directly for pairs that never made a ranked list
    * (content_search.py:300-333 + search_missing 358-405). kth comes from
    * the ranked lists. This is a join against the sketch table restricted to
    * candidate datasets — a broadcast of candidate ids at scale.
    */
  /** Materialize a ranked list as a LocalRelation. Ranked lists are
    * REQUEST-bounded by construction (≤ m rows per query column — the same
    * driver-side object the reference's TA combiner iterates,
    * combined_search.py:44-111), so the collect is m·#query-columns rows
    * regardless of lake scale. One collect replaces the query-scoped
    * persist whose cached plan each consumer (the kth table, the candidate
    * ids) re-scanned as its own broadcast-build JOB — with a LocalRelation
    * every downstream join embeds the list as a LocalTableScan that
    * broadcasts without a job, cutting per-request driver latency on the
    * warm serving path.
    */
  def localRanked(ranked: DataFrame): DataFrame =
    ranked.sparkSession.createDataFrame(
      java.util.Arrays.asList(ranked.collect(): _*), ranked.schema)

  def candidateEdges(sketch: DataFrame, queryId: String, ranked: DataFrame,
                     decay: Double = 0.01,
                     extraCandidates: Option[DataFrame] = None,
                     queryCols: Option[Seq[String]] = None,
                     localQuery: Option[DataFrame] = None,
                     extraCandidateIds: Option[Seq[String]] = None): DataFrame = {
    // ranked is request-bounded (a LocalRelation from [[localRanked]] on
    // the serving path), so the per-q_col kth is DRIVER-resident: serve it
    // as a literal MAP lookup compiled into the edge stream instead of a
    // broadcast join — a broadcast build is a Spark JOB even over a
    // LocalRelation on this runtime (tools/BcProbe), and the request path
    // is driver-latency-bound. The isNotNull filter replicates the former
    // INNER join: edges whose q_col never made a ranked list drop.
    val kthRows = ranked.select("q_col", "kth").collect().distinct
    val kthM =
      if (kthRows.isEmpty) map()
      else map(kthRows.flatMap(r =>
        Seq(lit(r.getString(0)), lit(r.getDouble(1)))).toSeq: _*)
    val query = queryProjection(localQuery.getOrElse(
      sketch.filter(col("dataset_id") === queryId)), queryCols)
    val candCols = extraCandidateIds match {
      case Some(extraIds) =>
        // serving path: ranked is a LocalRelation (jobless collect) and the
        // extra (metadata) candidates arrived as driver values, so the
        // whole candidate id set compiles into the sketch scan as an isin
        // predicate — no broadcast exchange, no per-request job
        val ids = (ranked.select("c_dataset").collect().map(_.getString(0))
          ++ extraIds).distinct.filterNot(_ == queryId).toSeq
        sketch.filter(col("dataset_id").isin(ids: _*))
          .select(col("dataset_id").as("c_dataset"),
            col("col_name").as("c_col"), col("col_type"),
            col("vector").as("c_vec"))
      case None =>
        val rankedIds = ranked.select(col("c_dataset").as("dataset_id"))
        // LEFT SEMI against the candidate ids: a semi join needs no
        // build-side distinct (the former inner-join + .distinct() paid one
        // more exchange inside the broadcast build), and duplicates can't
        // fan rows out
        val candIds = extraCandidates
          .map(e => rankedIds.unionAll(e.toDF("dataset_id")))
          .getOrElse(rankedIds)
          .filter(col("dataset_id") =!= queryId)
        sketch.join(broadcast(candIds), Seq("dataset_id"), "left_semi")
          .select(col("dataset_id").as("c_dataset"),
            col("col_name").as("c_col"), col("col_type"),
            col("vector").as("c_vec"))
    }
    joinQuery(candCols, query, localQuery.isDefined)
      .withColumn("dist", round6micro(VectorOps.euclid(col("q_vec"), col("c_vec"))))
      .drop("q_vec", "c_vec")
      .withColumn("kth", element_at(kthM, col("q_col")))
      .filter(col("kth").isNotNull)
      .withColumn("sim", round(exp(-lit(decay) * col("dist") / col("kth")), 6))
  }

  /** Ranked lists with per-query-column weights applied (the `w * sim` edge
    * weight used by the matcher; weights pre-normalized to sum 1 like
    * ui/dataset_graph.py:102-122). Uniform weights when none supplied.
    */
  def weighted(ranked: DataFrame, weights: Map[String, Double] = Map.empty,
               totalQueryCols: Option[Long] = None): DataFrame = {
    val withW =
      if (weights.nonEmpty) {
        val entries = weights.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq
        ranked.withColumn("w",
          coalesce(element_at(map(entries: _*), col("q_col")), lit(0.0)))
      } else {
        // Uniform weights normalize over ALL selected query columns (the UI
        // divides by the total selection, ui/dataset_graph.py:102-122) — a
        // query column with no same-type candidates still consumes its
        // share. Callers pass that total; fall back to the columns present.
        totalQueryCols match {
          case Some(n) => ranked.withColumn("w", lit(1.0 / n))
          case None =>
            val nDf = ranked.agg(countDistinct("q_col").as("n_qcols"))
            ranked.crossJoin(broadcast(nDf))
              .withColumn("w", lit(1.0) / col("n_qcols")).drop("n_qcols")
        }
      }
    withW.withColumn("w_sim", col("w") * col("sim"))
  }
}
