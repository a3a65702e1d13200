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

  test("skewAudit: planted hot key tops the report with the right salt") {
    import spark.implicits._
    // key 7: 60 planted + 2 filler = 62 rows; keys 1..20 (incl. 7) →
    // n_rows=100, n_keys=20, mean = 100 DIV 20 = 5,
    // skew_x1000 = 62·1000 DIV 5 = 12400, salt = ceil(62/5) = 13
    val df = (Seq.fill(60)(7L) ++ (1L to 20L).flatMap(k => Seq(k, k)))
      .toDF("uid")
    val rows = Salting.skewAudit(df, "uid", topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    graft.Caching.release()
    assert(rows.length == 3)
    assert(rows.head == ((1L, 7L, 62L, 620000L, 20L, 5L, 12400L, 13L)))
    // remaining top rows are the tied 2-row keys in key order
    assert(rows(1)._2 == 1L && rows(1)._3 == 2L && rows(2)._2 == 2L)
  }
}
