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
}
