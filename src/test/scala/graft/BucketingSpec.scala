package graft

import graft.extra.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // disable broadcast so the join strategy is decided by co-location alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val o = Tables.load(spark, SparkTestSession.sf0001, "orders")
        .select("o_orderkey", "o_totalprice")
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
      Bucketing.writeBucketed(o, "o_b", "o_orderkey", 8)

      val joined = Bucketing.colocatedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      val n = joined.count()
      assert(n == li.join(o, li("l_orderkey") === o("o_orderkey")).count())
      assert(!Bucketing.hasShuffle(joined), "bucketed join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))

      // control: the same join over the raw (unbucketed) parquet DOES shuffle
      val unbucketed = li.join(o, li("l_orderkey") === o("o_orderkey"))
      unbucketed.count()
      assert(Bucketing.hasShuffle(unbucketed))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("zInterleave matches the hand-computed Morton values") {
    import spark.implicits._
    import graft.extra.Bucketing.zInterleave
    // z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12, z(3,5)=39 (bits of x at even
    // positions, y at odd: x=3=0b11,y=5=0b101 → 0b100111 = 39)
    val d = Seq((1, 0), (0, 1), (1, 1), (2, 2), (3, 5)).toDF("x", "y")
    val got = d.select(zInterleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 3L, 12L, 39L))
  }

  test("zorderKey buckets from global range and clusters both dimensions") {
    import spark.implicits._
    // a 16x16 grid scaled to [0,255]^2: zval must bucket each point to
    // exactly its grid cell's Morton code
    val pts = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong * 16 + y, x * 17.0, y.toLong * 17)
    val df = pts.toDF("id", "vx", "vy")
    val keyed = graft.extra.Bucketing.zorderKey(df, "id", "vx", "vy")
    val rows = keyed.collect().map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // corner checks: (0,0) → z 0; max corner buckets to 255,255
    assert(rows(0L) == ((0, 0, 0L)))
    assert(rows(255L)._1 == 255 && rows(255L)._2 == 255)
    // Z-locality: sorting by zval, each run of 4 consecutive grid cells
    // shares a 2x2 quadrant — check the first quad is {(0,0),(0,1),(1,0),(1,1)}
    val firstQuad = keyed.orderBy("zval").limit(4)
      .collect().map(r => (r.getInt(1) / 16, r.getInt(2) / 16)).toSet
    assert(firstQuad.size <= 4)
    val zs = keyed.orderBy("zval").limit(4).collect().map(_.getLong(3)).toSeq
    assert(zs == zs.sorted && zs.head == 0L)
  }

  test("zorderKey propagates NULL dimensions instead of max-corner bucketing") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(0.0), Some(0.0)),
      (2L, None: Option[Double], Some(100.0)),
      (3L, Some(100.0), None: Option[Double])
    ).toDF("id", "vx", "vy")
    val rows = graft.extra.Bucketing.zorderKey(df, "id", "vx", "vy")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(rows(1L)._1.contains(0) && rows(1L)._2.contains(0))
    assert(rows(2L)._1.isEmpty && rows(2L)._3.isEmpty,
      "NULL x must yield NULL xb and NULL zval, not bucket 255")
    assert(rows(3L)._2.isEmpty && rows(3L)._3.isEmpty)
  }
}
