package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality / frequency sketches for lake-scale profiling — the two
  * one-pass summaries a 100 TB profiling job needs beside quantiles:
  * HyperLogLog distinct counts and count-min frequency estimates.
  *
  * Both use md5-derived hashes (the repo-wide trick from Dedup's MinHash
  * perms and DistanceJoin.rUnit) instead of engine-seeded RNG, so the whole
  * pipeline is deterministic integer/dyadic arithmetic that any engine with
  * md5 reproduces bit for bit — which is what makes the DuckDB oracles for
  * `hll_distinct` and `heavy_hitters` exact, not tolerance-based.
  *
  * Scale shape:
  *  - HLL: one scan; map-side partial max per (col, bucket) means the
  *    shuffle carries at most m=2^b rows per column per partition — constant
  *    per column regardless of input size. (Spark's built-in
  *    `approx_count_distinct` is the production shortcut; this version is
  *    engine-reproducible, same algorithm.)
  *  - CMS: one scan; map-side partial counts per (row, bucket) — the sketch
  *    is depth×width cells total, broadcastable; estimates for a probe set
  *    are a broadcast join, never a shuffle of the corpus.
  *
  * Reference alignment: danae profiles n_distinct exactly (profiler.py via
  * pandas nunique); exact countDistinct is what `profile_numeric_stats`
  * already does. These sketches are the scale path for the same statistics.
  */
object CardSketch {

  /** 32-bit uniform hash of a string column, salted: first 8 md5 hex chars.
    * DuckDB twin: ('0x' || substring(md5(salt || v), 1, 8))::BIGINT.
    */
  private def hash32(salt: String, v: Column): Column =
    conv(substring(md5(concat(lit(salt), v)), 1, 8), 16, 10).cast("long")

  // ---------------------------------------------------------------- HLL --

  /** HLL bucket-count exponent: m = 2^b buckets, w = 32-b remainder bits. */
  val HllB = 6
  val HllM: Int = 1 << HllB            // 64 buckets
  val HllW: Int = 32 - HllB            // 26 remainder bits
  /** Standard bias constant alpha_m = 0.7213 / (1 + 1.079/m). Computed once
    * in Scala and injected verbatim into the oracle SQL so both engines
    * multiply the identical double.
    */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** (col_name, v) value stream for a subset of a table's columns — one scan
    * covering all requested columns (explode, not per-column union).
    */
  def valueStream(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
      .filter(col("v").isNotNull)

  /** Per-column HLL distinct estimate over a (col_name, v) stream, with the
    * exact count alongside as the accuracy audit (drop it at real scale —
    * the exact count is the expensive thing the sketch replaces).
    *
    * rank arithmetic: h is 32-bit; bucket = top b bits; rest = low w bits;
    * rank = (leading zeros of rest within w bits) + 1 = w - bitlength + 1,
    * or w+1 when rest = 0. bitlength via length(bin(rest)) — both engines
    * print minimal-width binary. The harmonic sum Σ 2^-maxrank is dyadic
    * (every term a power of two, ranks ≤ w+1), so double summation is EXACT
    * and order-independent — no float drift between engines. No small-range
    * correction: that branch needs ln() (libm-dependent cross-engine) and
    * only matters when n ≲ 2.5m, where the exact count is cheap anyway.
    */
  /** (bucket, rank) of one value under the shared 32-bit md5 hash — the
    * per-row half of the HLL, reusable by the streaming cell maintainer.
    */
  def hllBucketRank(v: Column): (Column, Column) = {
    val h = hash32("hll:", v)
    val bucket = (h / lit(1L << HllW)).cast("long")
    val rest = h % lit(1L << HllW)
    val rank = when(rest > 0, lit(HllW) - length(bin(rest)) + 1)
      .otherwise(lit(HllW + 1))
    (bucket, rank)
  }

  /** Estimate from MERGEABLE cells (groupCols..., bucket, max_rank) — the
    * read-side fold: cells from any number of partial sketches (batch
    * shards, streamed windows) max-merge by construction before this.
    */
  def hllEstimate(cells: DataFrame, groupCols: Seq[String]): DataFrame =
    cells.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("max_rank"))).as("s"),
        count(lit(1)).as("present"))
      .select(groupCols.map(col) :+
        round(lit(HllAlpha * HllM.toDouble * HllM) /
          (col("s") + (lit(HllM) - col("present"))), 2).as("approx_distinct"): _*)

  def hllDistinct(values: DataFrame): DataFrame = {
    val (bucket, rank) = hllBucketRank(col("v"))
    val perBucket = values
      .withColumn("bucket", bucket)
      .withColumn("rank", rank)
      .groupBy("col_name", "bucket")
      .agg(max("rank").as("max_rank"))
    val est = hllEstimate(perBucket, Seq("col_name"))
    val exact = values.groupBy("col_name")
      .agg(countDistinct("v").as("exact_distinct"))
    est.join(exact, "col_name")
  }

  // ---------------------------------------------------------------- CMS --

  val CmsDepth = 3
  val CmsWidth = 64

  /** The depth (j, bucket) probe structs of one term — the ONE hash rule
    * every CMS surface shares (batch cells, heavy hitters, the streaming
    * cells, the read-side estimate), so sketches built anywhere merge and
    * probe consistently.
    */
  def cmsProbes(term: Column): Column =
    array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"),
        (hash32(s"cm:$j:", term) % CmsWidth).as("bucket"))): _*)

  /** Count-min sketch cells over a (term) token stream: depth hash rows,
    * bucket_j(term) = hash32("cm:j:", term) % width, cell value = number of
    * token occurrences hashing there. Returns (j, bucket, cnt).
    */
  def cmsCells(tokens: DataFrame, termCol: String = "term"): DataFrame =
    tokens.select(explode(cmsProbes(col(termCol))).as("e"))
      .groupBy(col("e.j").as("j"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Read-side CMS frequency estimate for `probeTerms` over (possibly
    * merged) cells carrying extra `groupCols` (e.g. a window start): per
    * (group, term) the classic min over the depth rows. A probe whose
    * depth rows are not all present estimates 0 (the term cannot have
    * occurred in that group — every occurrence increments all depth
    * cells). The cells side is depth×width×groups rows — broadcastable at
    * any corpus size.
    *
    * @return (groupCols..., term, est_count)
    */
  def cmsEstimate(cells: DataFrame, probeTerms: DataFrame,
                  groupCols: Seq[String] = Nil,
                  termCol: String = "term"): DataFrame = {
    val p = probeTerms.select(col(termCol).as("term"))
      .distinct()
      .select(col("term"), explode(cmsProbes(col("term"))).as("e"))
      .select(col("term"), col("e.j").as("j"), col("e.bucket").as("bucket"))
    cells.join(broadcast(p), Seq("j", "bucket"))
      .groupBy(groupCols.map(col) :+ col("term"): _*)
      .agg(min("cnt").as("mn"), count(lit(1)).as("nj"))
      .select(groupCols.map(col) :+ col("term") :+
        when(col("nj") === CmsDepth, col("mn")).otherwise(lit(0L))
          .as("est_count"): _*)
  }

  /** Top-k heavy hitters by CMS estimate over a token stream, with true
    * counts as the audit column. est = min over the depth rows of the cell
    * count — the classic CMS upper bound (est >= true always; equality when
    * no collision). The probe set is the distinct terms; at lake scale the
    * sketch (depth×width cells) broadcasts and the probe join is map-side.
    */
  def heavyHitters(tokens: DataFrame, k: Int = 20,
                   termCol: String = "term"): DataFrame = {
    val cells = cmsCells(tokens, termCol)
    val trueCounts = tokens.groupBy(termCol).agg(count(lit(1)).as("true_count"))
    val probes = trueCounts
      .select(col(termCol), explode(cmsProbes(col(termCol))).as("e"))
      .select(col(termCol), col("e.j").as("j"), col("e.bucket").as("bucket"))
    val est = probes.join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(termCol).agg(min("cnt").as("est_count"))
    est.join(trueCounts, termCol)
      .orderBy(col("est_count").desc, col(termCol).asc)
      .limit(k)
  }
}
