package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching for corpus blocklist filtering (the
  * C4-style "contains a banned word/phrase" gate, Raffel et al. 2020 §2.2;
  * also the Gopher / RefinedWeb URL-and-content blocklists).
  *
  * The naive relational form — `OR`/`+` over `contains(lower(text), term)`
  * per term — costs O(|terms| × |text|) per row: each `Contains` is its own
  * substring scan, so a 5k-phrase blocklist scans every document 5000
  * times. This is a classic Aho–Corasick automaton instead: ONE pass over
  * the document bytes finds every occurrence of every pattern,
  * O(|text| + matches) per row, independent of blocklist size.
  *
  * The automaton is built once on the driver from the (lowercased) term
  * list and ships to executors inside the serialized expression / codegen
  * references array — same distribution story as
  * [[LiteralMapLookup]]'s hash table: it IS the broadcast, no shuffle, no
  * join. Memory is nodes × (|pattern alphabet|+1) × 4 B for the
  * goto-complete DFA over the compressed alphabet (see
  * [[AcAutomaton.build]]) — a 10k-phrase lowercase-ASCII blocklist is
  * ~150k nodes × ~30 ints ≈ 18 MB, a driver/executor constant, not a
  * per-row or per-corpus cost.
  *
  * Matching is byte-level over UTF-8, which is exactly character-level
  * matching: a UTF-8 lead byte can never appear as a continuation byte, so
  * a byte-aligned occurrence of a valid UTF-8 pattern always lands on a
  * character boundary. Case folding goes through the SAME
  * `UTF8String.toLowerCase` that Spark's `lower` uses, so results are
  * bit-identical to the `contains(lower(text), lit(term.toLowerCase))`
  * composition (property-locked in SignalsSpec).
  */
final class AcAutomaton(termsLower: Array[String]) extends Serializable {

  val nTerms: Int = termsLower.length

  // goto-complete DFA: next(state)(byte) is always defined after build;
  // hits(state) lists the term ids whose occurrence ends at this state
  // (output sets merged through fail links at build time), null if none.
  private val built = AcAutomaton.build(termsLower)

  /** Number of DISTINCT blocklist terms occurring as substrings of
    * `lower(text)` — one pass, O(bytes + matches).
    */
  def distinctHits(text: UTF8String): Int = {
    val cls = built.cls
    val next = built.next
    val hits = built.hits
    val b = text.toLowerCase.getBytes
    val seen = new Array[Boolean](nTerms)
    var found = 0
    var s = 0
    var i = 0
    while (i < b.length && found < nTerms) {
      s = next(s)(cls(b(i) & 0xFF))
      val h = hits(s)
      if (h != null) {
        var j = 0
        while (j < h.length) {
          if (!seen(h(j))) { seen(h(j)) = true; found += 1 }
          j += 1
        }
      }
      i += 1
    }
    found
  }
}

object AcAutomaton {
  import scala.collection.mutable.ArrayBuffer

  /** `cls` maps a byte to its alphabet class; `next(state)(class)` is the
    * goto-complete transition; `hits(state)` the sorted term ids whose
    * occurrence ends at `state`, null if none.
    */
  private[functions] final case class Dfa(cls: Array[Int],
                                          next: Array[Array[Int]],
                                          hits: Array[Array[Int]])

  /** Trie → BFS fail links → goto-complete DFA with fail-closed output
    * sets, over a COMPRESSED alphabet: only bytes that occur in some
    * pattern get their own class; every other byte shares class 0, whose
    * transition from every state is the root (no pattern edge anywhere
    * carries it, so the fail chain always bottoms out). A transition row
    * is therefore |distinct pattern bytes|+1 ints, not 256 — ~30 for a
    * lowercase-ASCII phrase list — which keeps a 10k-phrase automaton in
    * the tens-of-MB class (nodes × row × 4 B) instead of 150 MB, and the
    * hot row much likelier to sit in cache. Matching pays one extra
    * 256-int class-table load per byte (L1-resident).
    */
  private[functions] def build(termsLower: Array[String]): Dfa = {
    val pats = termsLower.map(t => UTF8String.fromString(t).getBytes)
    require(pats.forall(_.nonEmpty), "blocklist terms must be non-empty")
    val cls = new Array[Int](256) // 0 = "not in any pattern"
    var nCls = 1
    for (p <- pats; b <- p) {
      val c = b & 0xFF
      if (cls(c) == 0) { cls(c) = nCls; nCls += 1 }
    }
    val nxt = ArrayBuffer(Array.fill(nCls)(-1))
    val out = ArrayBuffer(ArrayBuffer.empty[Int])
    var tid = 0
    while (tid < pats.length) {
      var s = 0
      for (b <- pats(tid)) {
        val c = cls(b & 0xFF)
        if (nxt(s)(c) == -1) {
          nxt(s)(c) = nxt.length
          nxt += Array.fill(nCls)(-1)
          out += ArrayBuffer.empty[Int]
        }
        s = nxt(s)(c)
      }
      out(s) += tid
      tid += 1
    }
    // BFS fail links; complete the goto function in place so matching
    // never chases fail chains (one array load per input byte).
    val fail = new Array[Int](nxt.length)
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < nCls) {
      if (nxt(0)(c) == -1) nxt(0)(c) = 0
      else { fail(nxt(0)(c)) = 0; queue.add(nxt(0)(c)) }
      c += 1
    }
    while (!queue.isEmpty) {
      val s = queue.poll()
      out(s) ++= out(fail(s)) // merged output set
      var c2 = 0
      while (c2 < nCls) {
        val t = nxt(s)(c2)
        if (t == -1) nxt(s)(c2) = nxt(fail(s))(c2)
        else { fail(t) = nxt(fail(s))(c2); queue.add(t) }
        c2 += 1
      }
    }
    Dfa(cls, nxt.toArray,
      out.map(o => if (o.isEmpty) null else o.toArray.sorted.distinct).toArray)
  }
}

/** Distinct-blocklist-term count per row via [[AcAutomaton]]; semantics ≡
  * `terms.map(t => contains(lower(text), lit(t)).cast("int")).reduce(_+_)`.
  * The automaton rebuilds lazily from the term list after (de)serialization
  * so expression equality/canonicalization stays structural on `terms`.
  */
case class BlocklistHits(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val automaton =
    new AcAutomaton(terms.map(Blocklist.fold).toArray)

  override protected def nullSafeEval(input: Any): Any =
    automaton.distinctHits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAc", automaton,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.distinctHits($c)")
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object Blocklist {
  /** Locale-independent term case-fold — the SAME `UTF8String.toLowerCase`
    * the text side goes through, so term and text folding can never
    * diverge (Java's `String.toLowerCase` is default-locale-sensitive:
    * under tr/az locales `"I"` folds to dotless `ı` while Spark's `lower`
    * yields `i`).
    */
  def fold(t: String): String = UTF8String.fromString(t).toLowerCase.toString

  /** Column wrapper: distinct blocklist terms present in `text`
    * (case-insensitive substring semantics).
    */
  def hits(text: Column, terms: Seq[String]): Column =
    GraftShim.column(BlocklistHits(GraftShim.expression(text), terms))
}
