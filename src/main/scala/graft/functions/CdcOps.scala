package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) — the storage-dedup boundary trick
  * (Muthitacharoen et al. 2001 LBFS; FastCDC, Xia et al. 2016) applied to
  * corpus text: chunk boundaries are decided by the CONTENT of a sliding
  * window, not by byte offsets, so an insertion near the top of a page
  * shifts every downstream offset but leaves every downstream boundary —
  * and therefore every downstream chunk hash — intact. Grouping chunk
  * hashes then finds shared runs between crawl snapshots / mirrored pages
  * that whole-document hashing misses and fixed-width shingling only
  * catches at one alignment.
  *
  * Boundary rule (engine-independent, so DuckDB can replay it exactly): a
  * cut falls AFTER code-point position `i` (1-based, `i ∈ [w, n]`) iff the
  * first hex nibble of `md5` of the w-character window ending at `i` is
  * `'0'` — expected chunk length 16 characters at the 1/16 nibble rate.
  * Every position is tested independently (no minimum chunk length), which
  * keeps the cut set closed-form — the classic CDC min/max-length clamps
  * make boundaries sequentially dependent and would force a recursive
  * oracle. md5-per-window costs O(w) per character; a production variant
  * swaps in a gear/rolling hash for O(1) per character at the price of an
  * engine-specific boundary function — the plumbing (this expression, the
  * dedup aggregation on top) is unchanged, so that swap is a constant in
  * this file, not an architecture change.
  *
  * Positions are Unicode code points (matching DuckDB `substr`/`length`);
  * windows/chunks hash their UTF-8 bytes, so both engines hash identical
  * byte strings. One pass per row, no shuffle: the expression returns the
  * chunk-hash array and rides the corpus scan inside codegen.
  */
object CdcChunks {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HEX(d(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5-hex chunk hashes of `u` under the window-`w` nibble-0 cut rule,
    * in document order. Empty array for the empty string; a doc shorter
    * than `w` is one chunk.
    */
  def chunkHashes(u: UTF8String, w: Int): GenericArrayData = {
    val b = u.getBytes
    // code-point start offsets: UTF-8 continuation bytes have the 10xxxxxx
    // prefix, so char starts are exactly the non-continuation bytes
    var n = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) n += 1
      i += 1
    }
    val offs = new Array[Int](n + 1)
    var k = 0
    i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { offs(k) = i; k += 1 }
      i += 1
    }
    offs(n) = b.length
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0))
    val md = mdLocal.get()
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef](n / 8 + 2)
    var prev = 0 // code-point index after the last cut
    var p = w
    while (p <= n) {
      md.update(b, offs(p - w), offs(p) - offs(p - w))
      val dig = md.digest() // resets
      if ((dig(0) & 0xF0) == 0) { // first hex nibble '0' → cut after p
        md.update(b, offs(prev), offs(p) - offs(prev))
        out += hex(md.digest())
        prev = p
      }
      p += 1
    }
    if (prev < n) {
      md.update(b, offs(prev), offs(n) - offs(prev))
      out += hex(md.digest())
    }
    new GenericArrayData(out.toArray)
  }
}

/** Chunk-hash array per row (see [[CdcChunks.chunkHashes]]). */
case class CdcChunkHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"CDC window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.chunkHashes(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks.chunkHashes($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcOps {
  /** Column wrapper: md5-hex CDC chunk hashes of `text`, window `w`. */
  def chunkHashes(text: Column, w: Int): Column =
    GraftShim.column(CdcChunkHashes(GraftShim.expression(text), w))
}
