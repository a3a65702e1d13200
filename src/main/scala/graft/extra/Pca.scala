package graft.extra

import graft.Caching
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Embedding-matrix second-order statistics and PCA whitening — the
  * retrieval-pipeline post-processing step (Mu & Viswanath's
  * all-but-the-top, FAISS's OPQ/whitening pre-transforms): estimate the
  * d×d covariance of the embedding cloud, eigendecompose it, and project /
  * whiten vectors so dominant directions stop drowning cosine similarity.
  *
  * Scale split, by data size not by habit:
  *
  *  - the COVARIANCE is corpus-sized work → distributed: micro-quantized
  *    vectors, upper-triangle pair products expanded per row (d(d+1)/2
  *    terms) into ONE map-side-combined aggregate whose output is d² rows
  *    regardless of corpus size; sums ride decimal(38,0) so no vector
  *    count overflows (BIGINT would cap at ~9M rows of 1e6-micro values).
  *  - the EIGENDECOMPOSITION is model-sized work (d×d, corpus-independent)
  *    → driver-side deflated power iteration on the collected covariance;
  *    collecting d² doubles is the same legitimacy class as collecting k
  *    centroids. No corpus data ever reaches the driver.
  *  - the PROJECTION is corpus-sized again → the k×d eigenbasis goes back
  *    as a broadcast literal and each vector's scores are one codegen'd
  *    fused dot-product chain; no shuffle at all.
  *
  * Engine-exactness: the covariance is exact integer moments (Σvᵢvⱼ, Σvᵢ as
  * decimals) with ONE pinned float expression at the end — identical IEEE
  * ops on identical integers in any engine, so `embed_cov` carries a full
  * DuckDB oracle. The eigen step is deterministic (fixed start, fixed
  * iteration count, double arithmetic on one machine) and spec-locked by
  * its mathematical properties instead (orthonormality, Cv≈λv residual,
  * descending λ, whitened unit variance).
  *
  * Reference anchor: the reference ships no embedding post-processing; its
  * numeric-profile analogue is the min/max/quantile sketch family
  * (ingest/profiling/profiler.py) — this is the multivariate completion an
  * embedding lake needs.
  */
object Pca {

  private def microVec(c: Column): Column =
    transform(c, x => round(x.cast("double") * lit(1000000)).cast("long"))

  /** Upper-triangle covariance report of the embedding matrix: exact
    * integer raw moments internally, the pinned double covariance in
    * original (pre-quantization) units as output.
    *
    * @return (i, j, cov) for 0 ≤ i ≤ j < d — cov = E[vᵢvⱼ] − E[vᵢ]E[vⱼ]
    *         rounded to 9 decimals. The raw moment s_ij stays INTERNAL:
    *         exported as a long it would wrap at the very corpus sizes the
    *         exact-decimal discipline exists for (~9.2M unit-scale vectors),
    *         and the report's consumer (the eigen step) only needs cov.
    */
  /** Shared final projection — the ONE float expression both covariance
    * paths run, so their outputs are bit-identical by construction.
    * Expects exact integer/decimal columns (i, j, s_ij, sm_i, sm_j, n);
    * s_ij may be decimal(38,0) or an exact integer string — either casts
    * to the identical nearest double.
    */
  private def covProjection(moments: DataFrame): DataFrame =
    moments.select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
      round((col("s_ij").cast("double") / col("n")
        - (col("sm_i").cast("double") / col("n"))
          * (col("sm_j").cast("double") / col("n"))) / 1e12, 9).as("cov"))

  def covariance(emb: DataFrame): DataFrame = {
    val e = Caching.temp(emb.select(microVec(col("embedding")).as("vm")))
    val n = e.agg(count(lit(1)).as("n"))
    val sums = e.select(posexplode(col("vm")).as(Seq("i", "vi")))
      .groupBy("i").agg(sum(col("vi").cast("decimal(38,0)")).as("sm"))
    val pairs = e.select(explode(expr(
      """flatten(transform(vm, (vi, i) ->
        |  transform(slice(vm, i + 1, size(vm) - i), (vj, jj) ->
        |    struct(i AS i, i + jj AS j, vi * vj AS p))))""".stripMargin)).as("s"))
      .select(col("s.i").as("i"), col("s.j").as("j"), col("s.p").as("p"))
      .groupBy("i", "j").agg(sum(col("p").cast("decimal(38,0)")).as("s_ij"))
    val si = sums.select(col("i").as("i2"), col("sm").as("sm_i"))
    val sj = sums.select(col("i").as("j2"), col("sm").as("sm_j"))
    covProjection(
      pairs.join(broadcast(si), col("i") === col("i2"))
        .join(broadcast(sj), col("j") === col("j2"))
        .crossJoin(broadcast(n))
        .select(col("i"), col("j"), col("s_ij"), col("sm_i"), col("sm_j"),
          col("n")))
  }

  /** Flat-buffer moment Aggregator shared state — see [[covarianceFast]].
    * Pair sums are 128-BIT: each d(d+1)/2 slot is a (hi, lo) long pair with
    * value hi·CARRY + lo (CARRY = 2⁴⁰), normalized whenever |lo| crosses
    * `normAt` (default 2⁶¹: a reduce leaves |lo| < 2⁶¹+2⁴⁰, so merging two
    * such buffers stays under 2⁶³ before its own normalization) — a GLOBAL
    * Σ vmᵢ·vmⱼ fits for any corpus a cluster can hold (hi ≤ rows, products
    * are ≤ ~2⁴⁰ per row at unit scale). The earlier long-only buffer
    * wrapped silently at ~9.2M unit-scale vectors because merge() funnels
    * every partition's buffer into one — the bound was per-CORPUS, not
    * per-task. Linear sums stay single longs: Σ|vmᵢ| ≤ rows·10⁶ overflows
    * only past ~9.2·10¹² rows, orders beyond a 100 TB embedding table
    * (~10¹¹ rows of 256-dim float32), and the decimal twin guards the day
    * that changes.
    *
    * Buffer layout: [0, d) linear sums · [d, d+P) pair hi · [d+P, d+2P) pair
    * lo · last = row count, with P = d(d+1)/2. `normAt` is a constructor
    * knob ONLY so the spec can force carries on fixture-sized data.
    */
  private[graft] class CovMoments(normAt: Long = 1L << 61)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Long], Array[Long], Seq[Long]] {
    private val Carry = 1L << 40
    def zero: Array[Long] = Array.empty
    def reduce(b0: Array[Long], vm: Seq[Long]): Array[Long] = {
      val d = vm.length
      val np = d * (d + 1) / 2
      val b = if (b0.nonEmpty) b0 else new Array[Long](d + 2 * np + 1)
      val v = vm.toArray
      var i = 0; var k = 0
      while (i < d) {
        b(i) += v(i)
        var j = i
        while (j < d) {
          val lo = d + np + k
          b(lo) += v(i) * v(j)
          if (b(lo) >= normAt || b(lo) <= -normAt) {
            b(d + k) += b(lo) / Carry; b(lo) = b(lo) % Carry
          }
          j += 1; k += 1
        }
        i += 1
      }
      b(b.length - 1) += 1
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else {
        // buffer length = d + 2·d(d+1)/2 + 1 = (d+1)²  ⇒  d = √len − 1
        val d = (math.sqrt(a.length.toDouble).round - 1).toInt
        val np = d * (d + 1) / 2
        var i = 0
        while (i < d) { a(i) += b(i); i += 1 }
        var k = 0
        while (k < np) {
          a(d + k) += b(d + k)
          val lo = d + np + k
          a(lo) += b(lo)
          if (a(lo) >= normAt || a(lo) <= -normAt) {
            a(d + k) += a(lo) / Carry; a(lo) = a(lo) % Carry
          }
          k += 1
        }
        a(a.length - 1) += b(b.length - 1)
        a
      }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    /** Exact pair sum (i,j) from a finished buffer. */
    def pairSum(flat: Seq[Long], d: Int, k: Int): BigInt = {
      val np = d * (d + 1) / 2
      BigInt(flat(d + k)) * Carry + BigInt(flat(d + np + k))
    }
  }

  /** Single-pass covariance — the scale path: one typed Aggregator carries
    * a flat integer buffer through reduce/merge (no pair-row explosion, no
    * hash-aggregate over 2080-key groups per partition), the one finished
    * row (model-sized) comes back to the driver, and the SAME
    * [[covProjection]] float expression produces the output —
    * bit-identical to [[covariance]] (spec-locked), so the `embed_cov`
    * oracle covers both. Pair sums ride the [[CovMoments]] 128-bit (hi, lo)
    * carry representation, so the GLOBAL Σ vmᵢ·vmⱼ is exact at any corpus
    * size — see the class doc for the bounds.
    */
  def covarianceFast(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(microVec(col("embedding")).as("vm")).as[Seq[Long]]
    val agg = new CovMoments()
    val flat = vecs.select(agg.toColumn).collect()(0)
    if (flat.isEmpty)  // empty table: empty report, same as the declarative twin
      return covProjection(spark.emptyDataFrame
        .select(lit(0L).as("i"), lit(0L).as("j"), lit("0").as("s_ij"),
          lit(0L).as("sm_i"), lit(0L).as("sm_j"), lit(1L).as("n")).limit(0))
    // L = d + 2·d(d+1)/2 + 1 = d² + 2d + 1  ⇒  d = √L − 1
    val d = (math.sqrt(flat.length.toDouble).round - 1).toInt
    val n = flat.last
    val rows = {
      val out = Seq.newBuilder[(Int, Int, String, Long, Long, Long)]
      var i = 0; var k = 0
      while (i < d) {
        var j = i
        while (j < d) {
          // exact integer moment as a STRING → decimal: never truncated
          out += ((i, j, agg.pairSum(flat, d, k).toString, flat(i), flat(j), n))
          j += 1; k += 1
        }
        i += 1
      }
      out.result()
    }
    covProjection(rows.toDF("i", "j", "s_ij", "sm_i", "sm_j", "n")
      .withColumn("s_ij", col("s_ij").cast("decimal(38,0)")))
  }

  /** Driver-side cyclic Jacobi eigendecomposition of the collected
    * covariance — for a model-sized (d×d) symmetric matrix this converges
    * to machine precision in a handful of sweeps, where deflated power
    * iteration stalls on near-degenerate eigenvalue pairs. Deterministic:
    * fixed sweep count, fixed (p,q) visit order.
    *
    * @return (eigenvalues desc, eigenvectors row-major) — top k pairs;
    *         ties in λ break on the first differing eigenvector component
    *         sign convention (largest-|component| entry made positive)
    */
  def eigTopK(cov: Array[Array[Double]], k: Int,
              sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val a = cov.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; p <- 0 until d; q <- p + 1 until d) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t = math.signum(theta) match {
          case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (j <- 0 until d) {
          val apj = a(p)(j); val aqj = a(q)(j)
          a(p)(j) = c * apj - s * aqj
          a(q)(j) = s * apj + c * aqj
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
    }
    val order = (0 until d).sortBy(i => -a(i)(i)).take(k)
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { c =>
      val col = Array.tabulate(d)(i => v(i)(c))
      // sign convention: the largest-|component| entry is positive
      val m = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Collect the covariance (d² doubles — model-sized) into a symmetric
    * matrix in original units.
    */
  def covMatrix(emb: DataFrame): Array[Array[Double]] = {
    val rows = covarianceFast(emb).collect()
    val d = rows.map(_.getLong(1)).max.toInt + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2))
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** PCA projection (optionally whitened) of every embedding onto the top-k
    * eigenbasis: scores are centered dot products against a broadcast
    * literal basis — one shuffle for the mean, then a pure codegen map.
    *
    * @return (vec_id, pc array<double> rounded 6) — whitened divides each
    *         score by √λ (unit variance per component, the similarity-
    *         search normalization)
    */
  /** All-but-the-top embedding post-processing (Mu & Viswanath, ICLR'18):
    * subtract the corpus mean and remove the projection onto the top-k
    * principal directions — the dominant components of text embedding
    * clouds encode frequency artifacts, and removing them measurably
    * improves cosine retrieval. v' = (v − μ) − Σ_c ((v−μ)·u_c) u_c, as one
    * shuffle-free broadcast-literal expression per output dimension.
    *
    * @return (vec_id, corrected array<double> rounded 6)
    */
  def allButTheTop(emb: DataFrame, k: Int = 2): DataFrame = {
    val (_, vecs) = eigTopK(covMatrix(emb), k)
    val cnt = emb.count().toDouble
    val mean = emb.select(posexplode(microVec(col("embedding"))).as(Seq("i", "vi")))
      .groupBy("i").agg(sum(col("vi").cast("decimal(38,0)")).as("sm"))
      .collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue / cnt / 1e6)
      .toMap
    val d = vecs(0).length
    def centered(i: Int): Column =
      col("embedding")(i).cast("double") - lit(mean(i))
    // scores (v−μ)·u_c as shared sub-expressions
    val scores: Seq[Column] = (0 until k).map { c =>
      (0 until d).map(i => centered(i) * lit(vecs(c)(i))).reduce(_ + _)
    }
    val outDims: Seq[Column] = (0 until d).map { i =>
      round(
        (0 until k).foldLeft(centered(i)) { (acc, c) =>
          acc - scores(c) * lit(vecs(c)(i))
        }, 6)
    }
    emb.select(col("vec_id"), array(outDims: _*).as("corrected"))
  }

  def project(emb: DataFrame, k: Int = 4, whiten: Boolean = false): DataFrame = {
    val (vals, vecs) = eigTopK(covMatrix(emb), k)
    // exact mean: decimal micro sums (partition-order-free), one driver div
    val cnt = emb.count().toDouble
    val mean = emb.select(posexplode(microVec(col("embedding"))).as(Seq("i", "vi")))
      .groupBy("i").agg(sum(col("vi").cast("decimal(38,0)")).as("sm"))
      .collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue / cnt / 1e6)
      .toMap
    val comps: Seq[Column] = (0 until k).map { c =>
      val dot = vecs(c).indices.map { i =>
        (col("embedding")(i).cast("double") - lit(mean(i))) * lit(vecs(c)(i))
      }.reduce(_ + _)
      val scaled = if (whiten) dot / lit(math.sqrt(math.max(vals(c), 1e-12)))
                   else dot
      round(scaled, 6)
    }
    emb.select(col("vec_id"), array(comps: _*).as("pc"))
  }
}
