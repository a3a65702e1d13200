package graft

import graft.Engine.{ContentSpec, MetadataSpec, SearchRequest}
import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("weight normalization (G4, dataset_graph.py:102-122)") {
    assert(Engine.normalize(Map("a" -> 2.0, "b" -> 2.0)) == Map("a" -> 0.5, "b" -> 0.5))
    val (wc, wm) = Engine.normalizeSplit(SearchRequest("x",
      ContentSpec(weight = 3.0), MetadataSpec(weight = 1.0)))
    assert(wc == 0.75 && wm == 0.25)
  }

  test("microWeights: quantize to micros summing exactly 1e6") {
    val w = Engine.microWeights(Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
    assert(w.values.sum == 1000000L)
    assert(w == Map("a" -> 333333L, "b" -> 333333L, "c" -> 333334L))
    assert(Engine.microWeights(Map("x" -> 2.0, "y" -> 1.0, "z" -> 1.0))
      == Map("x" -> 500000L, "y" -> 250000L, "z" -> 250000L))
  }

  test("weighted search: heavier column dominates the content score") {
    // all weight on one column ≡ selecting only it at weight 1: scores align
    val solo = Engine.search(spark, SparkTestSession.sf0001,
      SearchRequest("customer", ContentSpec(columns = Map("c_acctbal" -> 1.0),
        weight = 1.0), MetadataSpec(weight = 0.0), k = 5)).collect()
    assert(solo.nonEmpty)
    solo.foreach { r =>
      assert(math.abs(r.getAs[Double]("overall_score")
        - r.getAs[Double]("content_score")) < 1e-6)
    }
  }

  test("search honors the request: k, column restriction, weight split") {
    val full = Engine.search(spark, SparkTestSession.sf0001,
      SearchRequest("customer", k = 3)).collect()
    assert(full.length == 3)

    // content-only split: metadata contributes nothing
    val contentOnly = Engine.search(spark, SparkTestSession.sf0001,
      SearchRequest("customer", ContentSpec(weight = 1.0), MetadataSpec(weight = 0.0), k = 5))
      .collect()
    contentOnly.foreach { r =>
      assert(math.abs(r.getAs[Double]("overall_score") - r.getAs[Double]("content_score")) < 1e-6)
    }

    // restricting query columns to one numeric column still returns results
    val restricted = Engine.search(spark, SparkTestSession.sf0001,
      SearchRequest("customer", ContentSpec(columns = Map("c_acctbal" -> 1.0)), k = 5))
      .collect()
    assert(restricted.nonEmpty)
  }

  test("knn invariants (SURVEY §5.4): sim in (0,1], kth > 0, rank monotone in dist") {
    val r = graft.search.DistanceJoin.knn(
      graft.search.Sketches.cachedNumericTemporal(spark, SparkTestSession.sf0001),
      "customer", 100, 50).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val sim = row.getAs[Double]("sim")
      assert(sim > 0.0 && sim <= 1.0, s"sim out of range: $sim")
      assert(row.getAs[Double]("kth") > 0.0)
    }
    r.groupBy(_.getAs[String]("q_col")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("dist"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "dist must be non-decreasing in rank")
    }
  }
}
