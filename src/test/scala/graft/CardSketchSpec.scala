package graft

import graft.extra.CardSketch
import graft.ingest.TermStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CardSketch (HLL distinct + count-min heavy hitters) against a plain-Scala
  * reference implementation of the same md5 arithmetic — the distributed
  * pipeline must match the sequential one BIT FOR BIT, which is the same
  * property the DuckDB oracle checks at the gate.
  */
class CardSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def md5hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sequential HLL with CardSketch's exact constants. */
  private def hllRef(values: Seq[String]): Double = {
    val w = CardSketch.HllW; val m = CardSketch.HllM
    val maxRank = values.foldLeft(Map.empty[Long, Int]) { (acc, v) =>
      val h = md5hex8("hll:" + v)
      val bucket = h >> w
      val rest = h & ((1L << w) - 1)
      val rank = if (rest > 0) w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
                 else w + 1
      acc.updated(bucket, math.max(acc.getOrElse(bucket, 0), rank))
    }
    val s = maxRank.values.map(r => math.pow(2.0, -r)).sum + (m - maxRank.size)
    round2(CardSketch.HllAlpha * m.toDouble * m / s)
  }

  test("hllDistinct matches the sequential reference exactly") {
    val df = Tables.load(spark, dir, "orders")
    val got = CardSketch.hllDistinct(
        CardSketch.valueStream(df, Seq("o_custkey")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).head
    val vals = df.select(col("o_custkey").cast("string"))
      .na.drop().collect().map(_.getString(0)).toSeq
    assert(got._1 == "o_custkey")
    assert(got._2 == hllRef(vals))
    assert(got._3 == vals.distinct.size)
  }

  test("hllDistinct estimates within HLL error bounds on the fixture columns") {
    val stream = CardSketch.valueStream(Tables.load(spark, dir, "orders"), Seq("o_custkey"))
      .unionAll(CardSketch.valueStream(Tables.load(spark, dir, "lineitem"),
        Seq("l_partkey", "l_orderkey")))
    val rows = CardSketch.hllDistinct(stream).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val est = r.getDouble(1); val exact = r.getLong(2).toDouble
      // 1.04/sqrt(64) ~ 13% std error; 4 sigma headroom for a single draw
      assert(math.abs(est - exact) / exact < 0.52,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("heavyHitters matches the sequential CMS reference and upper-bounds truth") {
    val tokens = TermStats.tokens(Tables.load(spark, dir, "documents"), "doc_id", "text")
    val got = CardSketch.heavyHitters(tokens, 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val toks = tokens.select("term").collect().map(_.getString(0)).toSeq
    val trueCounts = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (t <- toks; j <- 0 until CardSketch.CmsDepth) {
      val b = md5hex8(s"cm:$j:" + t) % CardSketch.CmsWidth
      cells((j, b)) = cells.getOrElse((j, b), 0L) + 1
    }
    val est = trueCounts.keys.map { t =>
      t -> (0 until CardSketch.CmsDepth)
        .map(j => cells((j, md5hex8(s"cm:$j:" + t) % CardSketch.CmsWidth))).min
    }.toMap
    val expected = est.toSeq.sortBy { case (t, e) => (-e, t) }.take(20)
      .map { case (t, e) => (t, e, trueCounts(t)) }

    assert(got.toSeq == expected)
    got.foreach { case (t, e, tr) => assert(e >= tr, s"$t: est $e < true $tr") }
  }
}
