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
}
