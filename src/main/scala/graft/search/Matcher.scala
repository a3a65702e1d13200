package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Max-weight bipartite column matching — danae matches query columns to
  * candidate columns one-to-one and scores a candidate by the summed matched
  * edge weights (search/content_search.py:300-345,396-403, which calls
  * networkx.max_weight_matching on a bipartite graph; blossom there, but the
  * graph is always bipartite — node sets are query vs candidate columns — so
  * the Hungarian algorithm is exact and O(n^3)).
  *
  * Spark shape: the per-candidate graphs are tiny (≤ #columns per side), so
  * matching is executor-local work over a `collect_list` of edges per
  * candidate — grouped shuffle on candidate_id, then pure CPU. No driver
  * loops; 10^6 candidates = 10^6 independent small matchings, fully parallel.
  */
object Matcher {

  /** Exact max-weight bipartite matching on a dense non-negative weight
    * matrix (rows = query cols, cols = candidate cols; 0 = no edge).
    * Returns (total weight, assignment row→col, -1 = unmatched).
    * Kuhn-Munkres with potentials, minimizing the negated weights.
    */
  def maxWeight(weights: Array[Array[Double]]): (Double, Array[Int]) = {
    val nRows = weights.length
    if (nRows == 0) return (0.0, Array.empty)
    val nCols = weights.map(_.length).max
    if (nCols == 0) return (0.0, Array.fill(nRows)(-1))
    // pad to square: rows 1..n, cols 1..m with n <= m
    val transposed = nRows > nCols
    val a0 = if (transposed) {
      Array.tabulate(nCols, nRows)((i, j) =>
        if (i < weights(j).length) -weights(j)(i) else 0.0)
    } else {
      Array.tabulate(nRows, nCols)((i, j) =>
        if (j < weights(i).length) -weights(i)(j) else 0.0)
    }
    val n = a0.length
    val m = a0(0).length
    val INF = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1) // p(j) = row matched to col j
    val way = new Array[Int](m + 1)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(INF)
      val used = Array.fill(m + 1)(false)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = a0(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta } else minv(j) -= delta
          j += 1
        }
        j0 = j1
        done = p(j0) == 0
      }
      while (j0 != 0) { val j1 = way(j0); p(j0) = p(j1); j0 = j1 }
    }
    val rowToCol = Array.fill(n)(-1)
    for (j <- 1 to m) if (p(j) != 0) rowToCol(p(j) - 1) = j - 1
    var total = 0.0
    val assign =
      if (transposed) {
        val colToRow = Array.fill(nRows)(-1)
        for (i <- 0 until n; j = rowToCol(i) if j >= 0) colToRow(j) = i
        colToRow
      } else rowToCol
    for (i <- 0 until nRows; j = assign(i) if j >= 0 && j < weights(i).length)
      total += weights(i)(j)
    (total, assign)
  }

  /** Content score per candidate dataset: group the weighted ranked lists by
    * candidate, build the bipartite edge set (q_col ↔ c_col, weight = w*sim),
    * and sum the max-weight matching (content_search.py:335-345). Returns
    * (c_dataset, content_score, matching array<struct(q_col,c_col,weight)>).
    * The score is deliberately NOT normalized by column count — the
    * reference's scaling is commented out (content_search.py:434-438).
    */
  def contentScores(weightedRanked: DataFrame): DataFrame = {
    val matchUdf = udf { (edges: Seq[Row]) =>
      val qCols = edges.map(_.getString(0)).distinct.sorted
      val cCols = edges.map(_.getString(1)).distinct.sorted
      val qIdx = qCols.zipWithIndex.toMap
      val cIdx = cCols.zipWithIndex.toMap
      val w = Array.ofDim[Double](qCols.size, cCols.size)
      edges.foreach { e =>
        val i = qIdx(e.getString(0)); val j = cIdx(e.getString(1))
        w(i)(j) = math.max(w(i)(j), e.getDouble(2))
      }
      val (score, assign) = maxWeight(w)
      val matched = for {
        i <- qCols.indices
        j = assign(i) if j >= 0 && w(i)(j) > 0
      } yield (qCols(i), cCols(j), w(i)(j))
      (BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        matched)
    }
    weightedRanked
      .groupBy(col("c_dataset"))
      .agg(collect_list(struct(col("q_col"), col("c_col"), col("w_sim"))).as("edges"))
      .withColumn("m", matchUdf(col("edges")))
      .select(col("c_dataset"), col("m._1").as("content_score"),
        col("m._2").as("matching"))
  }

  /** Content scores with EXACT cross-engine-reproducible arithmetic: the
    * matching runs on integer micro-weights `round(sim * 1e6)` (sims are
    * already 6-decimal-rounded, so the micros are exact integers), making the
    * maximum total unique and free of floating-point tie ambiguity — any
    * engine that can enumerate assignments (e.g. the DuckDB oracle's
    * injective-assignment product) lands on the same total. The uniform
    * weight 1/totalQueryCols is applied AFTER the argmax (a positive scalar
    * never changes the maximizing matching) by INTEGER floor division —
    * `content_score = (micro_total DIV nQ) / 1e6` — not a float round of the
    * quotient: when nQ is even the quotient can land exactly on a half-micro,
    * where Spark's decimal-string HALF_UP and DuckDB's binary
    * half-away-from-zero can disagree (the lmScore boundary). Truncating
    * positive integer division is identical in every engine.
    * Matching payload weights are rescaled back to w*sim.
    */
  def contentScoresExact(edges: DataFrame, totalQueryCols: Long): DataFrame = {
    val scored = contentScores(
      edges.withColumn("w_sim", round(col("sim") * 1e6)))
    val n = totalQueryCols
    scored.select(
      col("c_dataset"),
      (expr(s"CAST(content_score AS BIGINT) DIV $n").cast("double") / 1e6)
        .as("content_score"),
      expr(s"transform(matching, e -> struct(e._1 AS q_col, e._2 AS c_col, " +
        s"CAST(CAST(e._3 AS BIGINT) DIV $n AS DOUBLE) / 1e6 AS weight))").as("matching"))
  }

  /** Exact content scores under NON-UNIFORM per-query-column weights. The
    * weights arrive as integer micro-numerators (normalized to sum exactly
    * 1e6 — see [[graft.Engine.microWeights]]): unlike the uniform case they
    * change the MAXIMIZING matching, so they must multiply the edge weights
    * BEFORE the argmax — the argmax then runs on the integers
    * `wNum(q_col) * round(sim*1e6)` (≤ 1e12 per edge, exact in a double) and
    * stays engine-reproducible. Scale: total is in (weight-micro × sim-micro)
    * units, so `content_score = (total DIV 1e6) / 1e6` — the weighted
    * analogue of the uniform 1/nQ, with the same truncating-division
    * discipline. A query column absent from the map gets weight 0 (the UI
    * deselected it but an edge slipped through — defensive).
    */
  def contentScoresExactWeighted(edges: DataFrame,
                                 microWeights: Map[String, Long]): DataFrame = {
    val entries = microWeights.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }.toSeq
    val scored = contentScores(
      edges.withColumn("w_sim",
        coalesce(element_at(map(entries: _*), col("q_col")), lit(0L)).cast("double")
          * round(col("sim") * 1e6)))
    scored.select(
      col("c_dataset"),
      (expr("CAST(content_score AS BIGINT) DIV 1000000").cast("double") / 1e6)
        .as("content_score"),
      expr("transform(matching, e -> struct(e._1 AS q_col, e._2 AS c_col, " +
        "CAST(CAST(e._3 AS BIGINT) DIV 1000000 AS DOUBLE) / 1e6 AS weight))")
        .as("matching"))
  }
}
