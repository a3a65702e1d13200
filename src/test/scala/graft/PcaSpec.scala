package graft

import graft.extra.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")

  private def localVecs: Array[Array[Long]] = {
    emb.select(transform(col("embedding"),
        x => round(x.cast("double") * lit(1000000)).cast("long")).as("vm"))
      .collect().map(_.getSeq[Long](0).toArray)
  }

  test("covariance matches an independent local computation exactly") {
    val vs = localVecs
    val n = vs.length
    val d = vs.head.length
    val got = Pca.covariance(emb).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2))
      .toMap
    graft.Caching.release()
    assert(got.size == d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d) {
      val s = vs.map(v => v(i) * v(j)).sum
      val smi = vs.map(_(i)).sum
      val smj = vs.map(_(j)).sum
      val cov = math.rint(((s.toDouble / n)
        - (smi.toDouble / n) * (smj.toDouble / n)) / 1e12 * 1e9) / 1e9
      assert(got((i, j)) == cov, s"cov at ($i,$j)")
    }
  }

  test("covarianceFast (single-pass Aggregator) equals the declarative path") {
    val slow = Pca.covariance(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    graft.Caching.release()
    def fast(p: Int) = Pca.covarianceFast(emb.repartition(p)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(fast(1) == slow)
    assert(fast(8) == slow)
  }

  test("CovMoments 128-bit carry: forced normalization changes nothing") {
    // normAt=1 forces the hi/lo carry on EVERY addition — the exact pair
    // sums must come out identical to the no-carry fixture-sized run, so
    // the overflow-safe representation is exercised without needing 9M
    // vectors in a unit test
    import spark.implicits._
    val vecs = emb.select(transform(col("embedding"),
        x => round(x.cast("double") * lit(1000000)).cast("long")).as("vm"))
      .as[Seq[Long]]
    val plain = vecs.select(new Pca.CovMoments().toColumn).collect()(0)
    val forced = vecs.select(new Pca.CovMoments(normAt = 1L).toColumn).collect()(0)
    val d = (math.sqrt(plain.length.toDouble).round - 1).toInt
    val helper = new Pca.CovMoments()
    for (k <- 0 until d * (d + 1) / 2)
      assert(helper.pairSum(plain, d, k) == helper.pairSum(forced, d, k),
        s"pair sum $k must be carry-invariant")
    // and against the independent local computation
    val vs = localVecs
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      assert(helper.pairSum(forced, d, k) ==
        BigInt(vs.map(v => v(i) * v(j)).sum), s"exact moment at ($i,$j)")
      k += 1
    }
  }

  test("covariance is partitioning-independent (exact decimal sums)") {
    def run(p: Int) = {
      val r = Pca.covariance(emb.repartition(p)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      graft.Caching.release()
      r
    }
    assert(run(1) == run(8))
  }

  test("eigTopK: orthonormal basis, small residual, descending eigenvalues") {
    val m = Pca.covMatrix(emb)
    graft.Caching.release()
    val d = m.length
    val k = 4
    val (vals, vecs) = Pca.eigTopK(m, k)
    // descending, non-negative (covariance is PSD)
    vals.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
    assert(vals.forall(_ >= -1e-9))
    // orthonormality
    for (a <- 0 until k; b <- 0 until k) {
      val dot = (0 until d).map(i => vecs(a)(i) * vecs(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"v${a}.v$b = $dot")
    }
    // eigen residual ‖Cv − λv‖ / λ small for each component
    for (c <- 0 until k) {
      val cv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * vecs(c)(j)).sum)
      val res = math.sqrt((0 until d).map(i => {
        val e = cv(i) - vals(c) * vecs(c)(i); e * e
      }).sum)
      assert(res / math.max(vals(c), 1e-12) < 1e-4, s"component $c residual $res")
    }
  }

  test("allButTheTop removes exactly the top components' variance") {
    val k = 2
    val m = Pca.covMatrix(emb)
    graft.Caching.release()
    val (vals, vecs) = Pca.eigTopK(m, k)
    val corrected = Pca.allButTheTop(emb, k).collect()
      .map(_.getSeq[Double](1).toArray)
    graft.Caching.release()
    val n = corrected.length
    val d = corrected.head.length
    // corrected cloud is centered
    for (i <- 0 until d) {
      val mu = corrected.map(_(i)).sum / n
      assert(math.abs(mu) < 1e-4, s"dim $i mean $mu")
    }
    // variance along each REMOVED direction is ~0 (was λ_c before)
    for (c <- 0 until k) {
      val proj = corrected.map(v => (0 until d).map(i => v(i) * vecs(c)(i)).sum)
      val variance = proj.map(x => x * x).sum / n
      assert(variance < vals(c) * 1e-6 + 1e-9,
        s"component $c residual variance $variance vs λ ${vals(c)}")
    }
    // total variance dropped by exactly Σ removed λ (within rounding)
    val totalBefore = (0 until d).map(i => m(i)(i)).sum
    val totalAfter = (0 until d).map { i =>
      val mu = corrected.map(_(i)).sum / n
      corrected.map(v => (v(i) - mu) * (v(i) - mu)).sum / n
    }.sum
    val wantDrop = vals.sum
    assert(math.abs((totalBefore - totalAfter) - wantDrop) / wantDrop < 0.01,
      s"dropped ${totalBefore - totalAfter} vs Σλ $wantDrop")
  }

  test("projection variance tracks the eigenvalue; whitening normalizes it") {
    val k = 3
    val (vals, _) = Pca.eigTopK(Pca.covMatrix(emb), k)
    graft.Caching.release()
    val pcs = Pca.project(emb, k).collect().map(_.getSeq[Double](1).toArray)
    graft.Caching.release()
    val n = pcs.length
    for (c <- 0 until k) {
      val xs = pcs.map(_(c))
      val mu = xs.sum / n
      val variance = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(variance - vals(c)) / math.max(vals(c), 1e-12) < 0.01,
        s"pc$c variance $variance vs λ ${vals(c)}")
    }
    val wh = Pca.project(emb, k, whiten = true).collect()
      .map(_.getSeq[Double](1).toArray)
    graft.Caching.release()
    for (c <- 0 until k) {
      val xs = wh.map(_(c))
      val mu = xs.sum / n
      val variance = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(variance - 1.0) < 0.01, s"whitened pc$c variance $variance")
    }
  }
}
