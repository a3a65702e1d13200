package graft

import graft.functions.VectorOps
import graft.search.{DistanceJoin, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spatial column search end-to-end: bbox sketches union into the index and
  * kNN follows the reference semantics — candidate SELECTION by the R-tree's
  * rectangle min-distance (index.py:37-43), SCORING by euclidean on the bbox
  * vector (content_search.py:58-70).
  */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ds(points: Seq[(Double, Double)]) =
    points.toDF("long", "lat")

  test("rectMinDist: 0 for overlapping boxes, edge gap otherwise") {
    val df = Seq(
      (Seq(0.0, 0.0, 1.0, 1.0), Seq(-10.0, -10.0, 10.0, 10.0)), // B contains A
      (Seq(0.0, 0.0, 1.0, 1.0), Seq(1.5, 1.5, 2.5, 2.5)),       // gap 0.5/0.5
      (Seq(0.0, 0.0, 1.0, 1.0), Seq(0.5, -3.0, 2.0, -2.0))      // overlap in x only
    ).toDF("a", "b")
    val got = df.select(round(VectorOps.rectMinDist(col("a"), col("b")), 6))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(got(1) == math.floor(math.sqrt(0.5 * 0.5 + 0.5 * 0.5) * 1e6) / 1e6
      || math.abs(got(1) - math.sqrt(0.5)) < 1e-6)
    assert(math.abs(got(2) - 2.0) < 1e-6) // y gap 2 (0 down to -2), x overlaps
  }

  test("spatial datasets searchable end-to-end; selection by rect, score by euclid") {
    // A: unit box at origin. B: huge box CONTAINING A (rect dist 0, euclid
    // large). C: small box near A (rect dist 0.707, euclid 3). The R-tree
    // order picks B before C; a euclid-only selection would pick C first.
    val sketch = Seq(
      "A" -> ds(Seq((0.0, 0.0), (1.0, 1.0))),
      "B" -> ds(Seq((-10.0, -10.0), (10.0, 10.0))),
      "C" -> ds(Seq((1.5, 1.5), (2.5, 2.5))))
      .map { case (id, df) => Sketches.forDataFrame(df, id) }
      .reduce(_.unionAll(_))
    assert(sketch.filter(col("col_type") === "Spatial").count() == 3)
    assert(sketch.filter(col("col_name") === "location").count() == 3)

    // m=2: the selection keeps {self, B} (rect 0, 0); C (rect 0.707) is cut.
    val got = DistanceJoin.knn(sketch, "A", m = 2, l = 50).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("c_dataset") == "B")
    val euclidAB = math.sqrt(100.0 + 100.0 + 81.0 + 81.0)
    assert(math.abs(r.getAs[Double]("dist") - euclidAB) < 1e-4,
      s"dist must be euclid on the bbox vector, got ${r.getAs[Double]("dist")}")
    // B is the only non-zero distance → it is its own kth → sim = exp(-decay)
    assert(math.abs(r.getAs[Double]("sim") - math.exp(-0.01)) < 1e-4)

    // with m=3 all candidates survive selection; C ranks closer than B by dist
    val all = DistanceJoin.knn(sketch, "A", m = 3, l = 50)
      .orderBy("rank").collect()
    assert(all.map(_.getAs[String]("c_dataset")).toSeq == Seq("C", "B"))
  }
}
