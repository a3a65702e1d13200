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

  // -------------------------------------------------------------------
  // Single-block MD5 fast path for the boundary test. A w-code-point
  // window is ≤ 4w UTF-8 bytes (≤ 32 at w=8) — always one 64-byte MD5
  // block — and the cut rule reads only the FIRST hex nibble, i.e. the
  // high nibble of output byte 0 = bits 4-7 of the A register. So the
  // per-position cost collapses from a MessageDigest update+digest
  // (object call overhead + padding bookkeeping + a byte[16] allocation
  // PER CHARACTER of corpus) to 64 unrolled rounds on four ints with a
  // reused block buffer. Bit-exactness with java.security MD5 is
  // property-locked in CdcSpec over all lengths 0..55; the round
  // constants are generated from the RFC 1321 definition
  // (K[i] = floor(abs(sin(i+1)) * 2^32)) rather than transcribed.
  // -------------------------------------------------------------------

  private val K: Array[Int] = Array.tabulate(64)(i =>
    ((StrictMath.abs(StrictMath.sin(i + 1.0)) * 4294967296.0).toLong
      & 0xFFFFFFFFL).toInt)
  private val S: Array[Int] = {
    val r = Array(Array(7, 12, 17, 22), Array(5, 9, 14, 20),
      Array(4, 11, 16, 23), Array(6, 10, 15, 21))
    Array.tabulate(64)(i => r(i / 16)(i & 3))
  }
  private val blockLocal = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** First output word (bytes 0-3, little-endian) of MD5 over
    * `bytes[off, off+len)`; `len` ≤ 55 (single block). Package-visible
    * for the CdcSpec bit-exactness lock.
    */
  private[graft] def md5FirstWord(bytes: Array[Byte], off: Int,
                                  len: Int): Int = {
    val m = blockLocal.get()
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xFF) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 16) {
      val f = (b & c) | (~b & d)
      val t = d; d = c; c = b
      b += Integer.rotateLeft(a + f + K(i) + m(i), S(i)); a = t
      i += 1
    }
    while (i < 32) {
      val f = (d & b) | (~d & c)
      val t = d; d = c; c = b
      b += Integer.rotateLeft(a + f + K(i) + m((5 * i + 1) & 15), S(i)); a = t
      i += 1
    }
    while (i < 48) {
      val f = b ^ c ^ d
      val t = d; d = c; c = b
      b += Integer.rotateLeft(a + f + K(i) + m((3 * i + 5) & 15), S(i)); a = t
      i += 1
    }
    while (i < 64) {
      val f = c ^ (b | ~d)
      val t = d; d = c; c = b
      b += Integer.rotateLeft(a + f + K(i) + m((7 * i) & 15), S(i)); a = t
      i += 1
    }
    0x67452301 + a
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Chunk ids are the FIRST 16 hex chars (64 bits) of the chunk md5 —
    * `substr(md5(chunk), 1, 16)` on the DuckDB side. Half the shuffle
    * and sort-key bytes of the full digest; 64 bits keeps chunk-id
    * collisions out of reach for any single-corpus run (birthday bound
    * ~10⁻⁴ at 10⁹ distinct chunks), and BOTH engines truncate the same
    * md5, so parity is untouched. (A production engine would use
    * xxhash64 outright; md5-prefix is the engine-independent compromise
    * the oracle can replay.)
    */
  private def hex16(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
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
      // first hex nibble '0' ⇔ high nibble of digest byte 0 ⇔ bits 4-7
      // of the little-endian A word — the single-block fast path (a
      // > 55-byte window, only reachable at w > 13 on 4-byte code
      // points, takes the MessageDigest path instead)
      val wOff = offs(p - w)
      val wLen = offs(p) - wOff
      val cut =
        if (wLen <= 55) (md5FirstWord(b, wOff, wLen) & 0xF0) == 0
        else { md.update(b, wOff, wLen); (md.digest()(0) & 0xF0) == 0 }
      if (cut) {
        md.update(b, offs(prev), offs(p) - offs(prev))
        out += hex16(md.digest()) // digest() resets
        prev = p
      }
      p += 1
    }
    if (prev < n) {
      md.update(b, offs(prev), offs(n) - offs(prev))
      out += hex16(md.digest())
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
