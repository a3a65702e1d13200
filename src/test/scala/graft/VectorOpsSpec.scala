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

  test("two instances of each expression codegen in ONE projection") {
    // Regression: generated locals must be ctx.freshName'd — two instances of
    // the same expression in one codegen scope otherwise trip janino's
    // "Redefinition of local variable" and the whole projection silently runs
    // interpreted (observed as random 10-30x query spikes in bench).
    // CODEGEN_ONLY + fallback=false turn that silent fallback into a failure.
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq(0.0, 0.0), Seq(3.0, 4.0), Seq(1, 2), Seq(3, 4), "0101", "0110"))
        .toDF("a", "b", "qa", "qb", "f1", "f2")
      val row = df.select(
        VectorOps.euclid(col("a"), col("b")).as("e1"),
        VectorOps.euclid(col("b"), col("a")).as("e2"),
        VectorOps.cosine(col("a"), col("b")).as("c1"),
        VectorOps.cosine(col("b"), col("b")).as("c2"),
        VectorOps.int8Dot(col("qa"), col("qb")).as("d1"),
        VectorOps.int8Dot(col("qb"), col("qb")).as("d2"),
        VectorOps.hamming(col("f1"), col("f2")).as("h1"),
        VectorOps.hamming(col("f1"), col("f1")).as("h2"),
        VectorOps.longL2Sq(array(lit(1L), lit(-3L)), array(lit(4L), lit(1L))).as("l1"),
        VectorOps.longL2Sq(array(lit(2L)), array(lit(2L))).as("l2")
      ).collect()(0)
      assert(row.getDouble(0) == 5.0 && row.getDouble(1) == 5.0)
      assert(row.getDouble(2) == 0.0 && math.abs(row.getDouble(3) - 1.0) < 1e-12)
      assert(row.getLong(4) == 11L && row.getLong(5) == 25L)
      assert(row.getInt(6) == 2 && row.getInt(7) == 0)
      assert(row.getLong(8) == 25L && row.getLong(9) == 0L)
    } finally {
      oldMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(v => conf.set("spark.sql.codegen.factoryMode", v))
      oldFb.fold(conf.unset("spark.sql.codegen.fallback"))(v => conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("longL2Sq known values, negative coords, length mismatch") {
    val df = Seq(
      (Seq(0L, 0L), Seq(3L, 4L)),        // 9 + 16
      (Seq(-1000000L, 2L), Seq(1000000L, 2L)), // (2e6)² — large-magnitude safe
      (Seq(1L, 2L, 99L), Seq(1L, 2L))    // min-length semantics like euclid
    ).toDF("a", "b")
    val got = df.select(VectorOps.longL2Sq(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == Seq(25L, 4000000000000L, 0L))
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
