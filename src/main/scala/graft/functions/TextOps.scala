package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-level text statistics as native codegen expressions — the
  * [[graft.extra.Signals.charEntropy]] hot path. The Column-expression
  * formulation (38 translate-counts folded by a higher-order aggregate)
  * costs ~0.6 ms/row: ArrayAggregate is CodegenFallback, so every row pays
  * interpreted lambda dispatch plus two BigDecimal rounds per symbol. This
  * expression does ONE pass over the string inside whole-stage codegen
  * (~µs/row) and reproduces the engine-exact arithmetic bit for bit: per
  * symbol p = cnt/total, ln(p) pinned to 6 decimals via the same
  * BigDecimal HALF_UP that Spark's `round` uses, micronat terms HALF_UP to
  * integers, integer sum (order-free by construction).
  */
object TextEntropy {

  /** Entropy in integer micronats over the 37-symbol alphabet
    * (a–z, 0–9, space) + other bucket. ASCII case is folded here (A–Z maps
    * to the a–z bucket), so the SQL-exposed `char_entropy_micro` is safe on
    * mixed-case input without a `lower()` wrapper; for the bucket alphabet
    * this is exactly equivalent to lowercasing first, because every
    * non-ASCII codepoint lands in the 'other' bucket regardless of case
    * (the one caveat: locale-expanding lowercasings like U+0130 → "i"+dot
    * count 1 char here vs 2 after `lower()` — outside the a–z/0–9 path,
    * negligible). 0 for the empty string (the Column layer maps it to
    * NULL).
    */
  def entropyMicro(u: UTF8String): Long = {
    val s = u.toString
    val counts = new Array[Long](38)
    var total = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      val idx =
        if (cp >= 'a' && cp <= 'z') cp - 'a'
        else if (cp >= 'A' && cp <= 'Z') cp - 'A'
        else if (cp >= '0' && cp <= '9') 26 + (cp - '0')
        else if (cp == ' ') 36
        else 37
      counts(idx) += 1
    }
    if (total == 0L) return 0L
    var sum = 0L
    var k = 0
    while (k < 38) {
      val c = counts(k)
      if (c > 0) {
        val p = c.toDouble / total
        val lnp6 = java.math.BigDecimal.valueOf(math.log(p))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        sum += java.math.BigDecimal.valueOf(-p * lnp6 * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
      k += 1
    }
    sum
  }

  /** Column wrapper: `char_entropy_micro(lowered_text)`. */
  def charEntropyMicro(lowered: Column): Column =
    GraftShim.column(CharEntropyMicro(GraftShim.expression(lowered)))
}

/** One-pass char-unigram entropy in integer micronats (see [[TextEntropy]]).
  * Codegen is a single static call — the loop lives in compiled Scala, not
  * generated Java, so there is no method-size risk however wide the
  * enclosing stage.
  */
case class CharEntropyMicro(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextEntropy.entropyMicro(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextEntropy.entropyMicro($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
