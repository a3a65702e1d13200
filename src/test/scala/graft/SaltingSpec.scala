package graft

import graft.extra.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join equals plain join on skewed fixture data") {
    val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val o = Tables.load(spark, SparkTestSession.sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .agg(count(lit(1)), round(sum("l_extendedprice"), 2)).collect()(0)
    val salted = Salting.saltedJoin(li, "l_orderkey", o, "o_orderkey", 8)
      .agg(count(lit(1)), round(sum("l_extendedprice"), 2)).collect()(0)
    assert(plain == salted)
  }

  test("salted aggregation equals plain aggregation") {
    val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Salting.saltedAgg(li, "l_returnflag", 8,
        Seq("pn" -> count(lit(1)), "pq" -> sum("l_quantity")),
        Seq(sum("pn").as("n"), round(sum("pq"), 2).as("q")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(plain == salted)
  }
}
