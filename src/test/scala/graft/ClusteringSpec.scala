package graft

import graft.extra.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")

  /** Pure-Scala mirror of the exact-integer Lloyd rules: micro quantize,
    * md5-seeded init, argmin on Σ(Δ)² with cluster-id tie-break, sign-split
    * truncating per-dim mean. Independent of Spark's plan machinery, so
    * agreement pins the SEMANTICS, not the implementation.
    */
  private def localKmeans(vecs: Map[Long, Array[Long]], k: Int, iters: Int)
  : Map[Long, (Long, Long)] = {
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var cent: Map[Long, Array[Long]] =
      vecs.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(k)
        .zipWithIndex.map { case (id, i) => (i + 1).toLong -> vecs(id) }.toMap
    def assign(): Map[Long, (Long, Long)] = vecs.map { case (id, v) =>
      val (c, dd) = cent.toSeq.map { case (cid, cv) => (cid, d2(v, cv)) }
        .minBy { case (cid, dd) => (dd, cid) }
      id -> (c, dd)
    }
    def tdiv(s: Long, n: Long): Long = if (s >= 0) s / n else -((-s) / n)
    for (_ <- 1 to iters) {
      val a = assign()
      cent = a.groupBy(_._2._1).map { case (cid, members) =>
        val vs = members.keys.map(vecs).toSeq
        val dim = vs.head.length
        cid -> Array.tabulate(dim)(i => tdiv(vs.map(_(i)).sum, vs.size.toLong))
      }
    }
    assign()
  }

  test("kmeansAssign matches an independent local implementation exactly") {
    val local = {
      val rows = emb.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000)).cast("long")).as("vm"))
        .collect()
      rows.map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    }
    val want = localKmeans(local, k = 8, iters = 3)
    val got = Clustering.kmeansAssign(emb, 8, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.Caching.release()
    assert(got.size == local.size)
    assert(got == want)
  }

  test("k=0 yields an empty assignment, not NULL-cluster rows") {
    // the broadcast-argmin projection must keep the old window form's
    // empty-centroid contract: array_min over zero centroids is NULL and
    // would otherwise emit one NULL row per vector
    assert(Clustering.kmeansAssign(emb, 0, 1).count() == 0)
    graft.Caching.release()
  }

  test("objective is non-increasing across Lloyd iterations") {
    val totals = (0 to 3).map { it =>
      val t = Clustering.kmeansAssign(emb, 8, it)
        .agg(sum("d2")).collect()(0).getLong(0)
      graft.Caching.release()
      t
    }
    totals.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"objective went up: $totals")
    }
  }

  test("assignment is partitioning-independent") {
    val a1 = Clustering.kmeansAssign(emb.repartition(1), 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caching.release()
    val a8 = Clustering.kmeansAssign(emb.repartition(8), 8, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.Caching.release()
    assert(a1 == a8)
  }

  test("summary sizes sum to N and tightest is the cluster argmin") {
    val a = Clustering.kmeansAssign(emb, 8, 2).collect()
    graft.Caching.release()
    val s = Clustering.kmeansSummary(emb, 8, 2).collect()
    graft.Caching.release()
    assert(s.map(_.getAs[Long]("n_vecs")).sum == a.length)
    val byCluster = a.groupBy(_.getLong(1))
    s.foreach { r =>
      val members = byCluster(r.getAs[Long]("cluster"))
      val want = members.minBy(m => (m.getLong(2), m.getLong(0))).getLong(0)
      assert(r.getAs[Long]("tightest") == want)
    }
  }

  test("clusterSample: √size quotas, farthest-first within a cell") {
    val asg = Clustering.kmeansAssign(emb, 8, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.Caching.release()
    val got = Clustering.clusterSample(emb, total = 100, k = 8, iters = 3)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("d2"), r.getAs[Long]("quota"), r.getAs[Long]("rk")))
    graft.Caching.release()

    // quotas match the local temperature rule on the same assignment
    val sizes = asg.groupBy(_._2).view.mapValues(_.length).toMap
    val w = sizes.view.mapValues(n => math.rint(math.sqrt(n.toDouble) * 1e6).toLong).toMap
    val tot = w.values.sum
    val wantQuota = w.view.mapValues(wc => 100L * wc / tot).toMap
    got.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.head._4 == wantQuota(c), s"cluster $c quota")
      assert(rows.length == math.min(wantQuota(c), sizes(c).toLong), s"cluster $c size")
      // selected = the quota FARTHEST members (d2 desc, vec_id tiebreak)
      val want = asg.filter(_._2 == c).sortBy(a => (-a._3, a._1))
        .take(wantQuota(c).toInt).map(_._1).toSet
      assert(rows.map(_._1).toSet == want, s"cluster $c members")
    }
    // the sample is cluster-balanced: every non-empty cell is represented
    assert(got.map(_._2).distinct.length == sizes.size)
  }

  test("Aggregator centroid update is bit-identical to the declarative twin") {
    def run(aggUpdate: Boolean) = {
      val r = Clustering.kmeansAssignImpl(emb, 8, 3, aggUpdate).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.Caching.release()
      r
    }
    assert(run(true) == run(false))
  }

  test("clusterSample is partitioning-independent") {
    def run(n: Int) = {
      val r = Clustering.clusterSample(emb.repartition(n), 50, 8, 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      graft.Caching.release()
      r
    }
    assert(run(1) == run(8))
  }
}
