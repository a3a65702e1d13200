package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's t1 smoke: flagship entry() must return rows. */
class SmokeSpec extends AnyFunSuite {
  test("entry returns scored similar datasets") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    val rows = df.collect()
    assert(rows.length > 0)
    val top = rows.maxBy(_.getAs[Double]("overall_score"))
    assert(top.getAs[Double]("overall_score") > 0.0)
  }

  test("every declared oracle has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
