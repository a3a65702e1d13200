package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("euclidean distance known values") {
    val df = Seq((Seq(0.0, 0.0, 0.0), Seq(3.0, 4.0, 0.0)),
      (Seq(1.0, 1.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorOps.euclid(col("a"), col("b"))).as[Double].collect()
    assert(got.toSeq == Seq(5.0, 0.0))
  }

  test("cosine similarity known values and zero-norm guard") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),   // orthogonal → 0
      (Seq(1.0, 2.0), Seq(2.0, 4.0)),   // parallel → 1
      (Seq(0.0, 0.0), Seq(1.0, 1.0))    // zero norm → 0 by convention
    ).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val got = df.select(VectorOps.euclid(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
  }

  test("codegen and interpreted agree") {
    val df = (1 to 100).map(i =>
      (Seq.tabulate(7)(j => i * 0.1 + j), Seq.tabulate(7)(j => j * 0.5 - i * 0.01)))
      .toDF("a", "b")
    val viaExpr = df.select(VectorOps.euclid(col("a"), col("b"))).as[Double].collect()
    val viaHof = df.select(
      sqrt(aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))).as[Double].collect()
    viaExpr.zip(viaHof).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
  }
}
