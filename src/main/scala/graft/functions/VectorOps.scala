package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Vector math over `array<double>` columns as native Catalyst expressions
  * with whole-stage codegen — the hot path of the sketch kNN join
  * (reference computes these in numpy: search/content_search.py:58-70
  * euclidean; embedding cosine is implicit in the R-tree distance).
  *
  * A Scala UDF here would ser/de every array through the encoder on every
  * probe of the distance join; these expressions instead read the unsafe
  * array buffers in place and stay inside the generated loop, which is what
  * makes the brute-force distance join viable before LSH kicks in at scale.
  */
/** Callers guarantee both children are `array<double>` (VectorOps casts at
  * the Column layer), so no ExpectsInputTypes — that trait's signature is
  * private[sql] in Spark 4.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** sqrt(sum((a_i - b_i)^2)) — search/content_search.py:58-70. */
case class EuclideanDistance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for EVERY local: two instances of this expression can land
      // in one generated function scope (janino rejects the redefinition and
      // Spark silently falls back to interpreted projection — 10-30x slower)
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot(a,b) / (|a| * |b|); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see EuclideanDistance.doGenCode
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** The arithmetic behind [[Round0HalfUp]], shared by interpreted eval and
  * the generated code. Decision-identical to Spark's Round(d, 0) —
  * BigDecimal.valueOf(d).setScale(0, HALF_UP).toDouble — WITHOUT the
  * per-row BigDecimal (Double.toString + decimal parse, ~200ns: measured
  * dominating bitext_mine's 1.6G-pair cross product at sf10). Proof of
  * equivalence, on the MAGNITUDE a = |d| (negation is exact; for a ≥ 0
  * the subtraction a - floor(a) is exact — both operands are multiples of
  * ulp(a), the true difference is < 1 and fits the mantissa; computing the
  * fraction on a NEGATIVE d directly is NOT exact: the difference crosses
  * a binade and ties-to-even can round it onto exactly 0.5, observed at
  * d = -0.49999999999999994): k + 0.5 is exactly representable and a
  * shortest-round-trip decimal D of a preserves order against any
  * exactly-representable double, so comparing the BINARY fraction against
  * 0.5 decides exactly as BigDecimal's decimal comparison; frac == 0.5 ⇒
  * the decimal is exactly .5 ⇒ HALF_UP rounds the magnitude up (away from
  * zero). |a| ≥ 2^52 is already integral (frac = 0); NaN/±Inf pass
  * through like Round's guard; the final +0.0 normalizes -0.0 to the
  * +0.0 BigDecimal produces. Locked ≡ round(col, 0) bit-for-bit over
  * adversarial inputs (ties, next-to-tie neighbors, binade edges) in
  * GraftFunctionsSpec.
  */
object Round0Math {
  def halfUp(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else {
      val neg = d < 0
      val a = if (neg) -d else d
      val f = math.floor(a)
      val r = if (a - f >= 0.5) f + 1.0 else f
      (if (neg) -r else r) + 0.0
    }
  }
}

/** round(d, 0) as a native codegen expression — see [[Round0Math]]. */
case class Round0HalfUp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(d: Any): Any =
    Round0Math.halfUp(d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.Round0Math.halfUp($d)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Σ a_i·b_i over two `array<int>` columns of int8 codes, accumulated in
  * long — the inner loop of the quantized ANN path (EmbeddingKnn
  * .int8Rerank). The higher-order-function equivalent
  * (`aggregate(zip_with(...))`) is CodegenFallback — per-element closure
  * calls and boxed Any accumulation; this expression is a tight generated
  * int-multiply loop that stays inside whole-stage codegen.
  */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getInt(i).toLong * y.getInt(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see EuclideanDistance.doGenCode
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ (a_i - b_i)² over two `array<long>` columns of micro-quantized
  * coordinates — the inner loop of the k-means assignment step
  * (extra/Clustering.kmeansAssign). All-integer on purpose: quantizing
  * vectors to 1e-6 micros first makes squared distance EXACT integer
  * arithmetic, so the argmin (and therefore the whole clustering) is
  * bit-identical across engines and partitionings — no last-ulp sqrt or
  * summation-order hazards to round away. Max magnitude is bounded:
  * unit-scale coords are ≤ ~2e6 micros, so one term is ≤ 4e12 and a
  * 64-dim sum ≤ ~3e14, far inside long range.
  */
case class LongL2Squared(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { val d = x.getLong(i) - y.getLong(i); s += d * d; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see EuclideanDistance.doGenCode
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Hamming distance between two fingerprint strings (count of differing
  * byte positions over the common length — exact for the ASCII '0'/'1'
  * bit strings SimHash emits). The `zip_with(split(a,''), split(b,''))`
  * equivalent materializes two char arrays per comparison and falls back
  * from codegen; this reads the UTF8String bytes in place inside the
  * generated loop of the band-join verify stage.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = 0
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName for every local — see EuclideanDistance.doGenCode
      val xb = ctx.freshName("xb"); val yb = ctx.freshName("yb")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |int $d = 0;
         |for (int $i = 0; $i < $n; $i++) { if ($xb[$i] != $yb[$i]) $d++; }
         |${ev.value} = $d;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorOps {
  import GraftShim.{column, expression}

  /** Euclidean distance between two array<double> columns (codegen'd). */
  def euclid(a: Column, b: Column): Column =
    column(EuclideanDistance(expression(a), expression(b)))

  /** Cosine similarity between two array<double> columns (codegen'd). */
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** round(c, 0) without the per-row BigDecimal (codegen'd, decision-
    * identical — [[Round0Math]]). For candidate-matrix-scale streams.
    */
  def round0(c: Column): Column = column(Round0HalfUp(expression(c)))

  /** Integer dot product of two array<int> quantization-code columns,
    * long-accumulated (codegen'd).
    */
  def int8Dot(a: Column, b: Column): Column =
    column(Int8DotProduct(expression(a), expression(b)))

  /** Hamming distance between two fingerprint strings (codegen'd). */
  def hamming(a: Column, b: Column): Column =
    column(HammingDistance(expression(a), expression(b)))

  /** Exact integer Σ(a_i-b_i)² of two array<long> micro-vector columns
    * (codegen'd) — the k-means assignment metric.
    */
  def longL2Sq(a: Column, b: Column): Column =
    column(LongL2Squared(expression(a), expression(b)))

  /** Rectangle minimum distance between two bbox vectors
    * [x_min, y_min, x_max, y_max] — the R-tree's nearest-neighbor metric
    * (libspatialindex MINDIST, used by reference search/index.py:37-43 for
    * Spatial candidate selection): 0 when the boxes overlap, else the
    * euclidean gap between the closest edges. Composed from codegen'd
    * builtins (greatest/element_at), no UDF.
    */
  def rectMinDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{element_at, greatest, lit, sqrt}
    def el(v: Column, i: Int) = element_at(v, i)
    val dx = greatest(lit(0.0), el(b, 1) - el(a, 3), el(a, 1) - el(b, 3))
    val dy = greatest(lit(0.0), el(b, 2) - el(a, 4), el(a, 2) - el(b, 4))
    sqrt(dx * dx + dy * dy)
  }
}
