package graft.functions

import org.apache.spark.sql.{GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, ElementAt, Expression, Greatest, Literal, Multiply, Sqrt, Subtract}

/** SQL surface for the engine's native expressions: a user of the library
  * can run every codegen'd primitive from `spark.sql(...)` — not just the
  * Column API — so ad-hoc similarity/dedup queries compose with plain SQL
  * over the same tables. Two registration paths:
  *
  *  - [[registerAll]] on a live session (temp functions);
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (the production path — survives `newSession()`).
  */
object GraftFunctions {

  /** (name, builder) for every SQL-exposed function. Builders are plain
    * `Seq[Expression] => Expression`, the FunctionRegistry contract.
    */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_euclid" -> (es => EuclideanDistance(es(0), es(1))),
    "vec_cosine" -> (es => CosineSimilarity(es(0), es(1))),
    "int8_dot" -> (es => Int8DotProduct(es(0), es(1))),
    "hamming_dist" -> (es => HammingDistance(es(0), es(1))),
    // composed from codegen'd builtins, exposed under one SQL name
    "rect_min_dist" -> (es => rectMinDistExpr(es(0), es(1))),
    // one-pass char-unigram entropy in integer micronats; ASCII case is
    // folded inside the expression (see functions/TextOps.scala)
    "char_entropy_micro" -> (es => CharEntropyMicro(es(0))),
    // exact integer Σ(Δ)² over micro-quantized array<long> vectors — the
    // k-means assignment metric (extra/Clustering)
    "long_l2_sq" -> (es => LongL2Squared(es(0), es(1))),
    // CDC chunk-hash array; window width must be an int literal
    "cdc_chunks" -> (es => CdcChunkHashes(es(0), foldInt(es(1), "cdc_chunks window"))),
    // distinct blocklist-term hits; terms must be a foldable string array
    // (e.g. array('merge batch', 'lorem ipsum'))
    "blocklist_hits" -> (es => BlocklistHits(es(0), foldStrings(es(1), "blocklist_hits terms")))
  )

  private def foldInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def foldStrings(e: Expression, what: String): Seq[String] = {
    require(e.foldable, s"$what must be a literal array of strings")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map { u =>
          // a NULL array element would NPE on .toString below (ADVICE r16);
          // give it the same clean plan-time error as the other shapes
          if (u == null) throw new IllegalArgumentException(
            s"$what must be an array-of-strings literal with no NULL elements")
          u.toString
        }.toSeq
      case other => throw new IllegalArgumentException(
        s"$what must be an array-of-strings literal, got $other")
    }
  }

  /** Catalyst-node twin of VectorOps.rectMinDist (a builder cannot embed
    * Column-layer nodes — they stay unresolved inside SQL plans): MINDIST
    * between [x_min, y_min, x_max, y_max] bboxes from resolved primitives.
    */
  private def rectMinDistExpr(a: Expression, b: Expression): Expression = {
    def el(v: Expression, i: Int): Expression = ElementAt(v, Literal(i))
    val zero = Literal(0.0)
    val dx = Greatest(Seq(zero, Subtract(el(b, 1), el(a, 3)),
      Subtract(el(a, 1), el(b, 3))))
    val dy = Greatest(Seq(zero, Subtract(el(b, 2), el(a, 4)),
      Subtract(el(a, 2), el(b, 4))))
    Sqrt(Add(Multiply(dx, dx), Multiply(dy, dy)))
  }

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (n, b) => GraftShim.registerFunction(spark, n, b) }
}
