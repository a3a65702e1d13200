package graft

import graft.extra.CdcDedup
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: the cut rule and chunk hashes are recomputed
  * here INDEPENDENTLY (code-point slices + java MD5 over a plain String,
  * no shared code with [[graft.functions.CdcChunks]]'s byte-offset walk),
  * then the shift-invariance property and the dedup aggregation are checked
  * on constructed corpora.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val W = 8

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Independent reimplementation over code points. */
  private def refChunks(text: String): Seq[String] = {
    val cps = text.codePoints().toArray
    def slice(a: Int, b: Int): String = new String(cps, a, b - a)
    val n = cps.length
    val cuts = (W to n).filter(i => md5hex(slice(i - W, i)).charAt(0) == '0')
    val bounds = (0 +: cuts) :+ n
    bounds.sliding(2).collect {
      case Seq(a, b) if b > a => md5hex(slice(a, b)).take(16)
    }.toSeq
  }

  private def engineChunks(text: String): Seq[String] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    df.select(graft.functions.CdcOps.chunkHashes(
        org.apache.spark.sql.functions.col("text"), W).as("c"))
      .collect().head.getSeq[String](0)
  }

  test("single-block MD5 fast path is bit-exact with java.security MD5 " +
    "over EVERY length 0..55 × random bytes (locks the generated round " +
    "constants and the padding/length encoding)") {
    val rnd = new scala.util.Random(55)
    val jdk = java.security.MessageDigest.getInstance("MD5")
    for (len <- 0 to 55; _ <- 0 until 40) {
      val pad = rnd.nextInt(4)
      val buf = new Array[Byte](pad + len + rnd.nextInt(4))
      rnd.nextBytes(buf)
      val fast = graft.functions.CdcChunks.md5FirstWord(buf, pad, len)
      val dig = jdk.digest(java.util.Arrays.copyOfRange(buf, pad, pad + len))
      val ref = (dig(0) & 0xFF) | ((dig(1) & 0xFF) << 8) |
        ((dig(2) & 0xFF) << 16) | ((dig(3) & 0xFF) << 24)
      assert(fast == ref, s"len=$len off=$pad")
    }
  }

  test("chunkHashes ≡ independent code-point reimplementation — random " +
    "ASCII and multibyte docs, incl. shorter-than-window and empty") {
    val rnd = new scala.util.Random(77)
    val alphabet = "abcdefgh é中😀 " // incl. a surrogate pair
    val texts = Seq("", "short", "exactly8") ++ (0 until 120).map(_ =>
      (0 until rnd.nextInt(400)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (t <- texts) {
      // build via String to keep surrogate pairs intact
      assert(engineChunks(t) == refChunks(t), s"mismatch on ${t.take(40)}")
    }
  }

  test("chunks reassemble the document: hash list = md5 of consecutive " +
    "slices covering the text exactly once") {
    val t = "the quick brown fox jumps over the lazy dog " * 12
    val got = engineChunks(t)
    assert(got.nonEmpty && got == refChunks(t))
    // sub-window doc is one whole-text chunk
    assert(engineChunks("tiny") == Seq(md5hex("tiny").take(16)))
  }

  test("shift invariance: chunks strictly inside a common suffix survive a " +
    "prefix insertion (the property offset-based shingling lacks)") {
    val y = "value table part hash merge batch window spark order data " * 8
    val a = y
    val b = "inserted header text " + y
    // expected shared chunks, derived from the reference cut rule: chunks
    // of `a` whose start cut is ≥ W into the suffix (window fully inside y)
    val cutsA = (W to a.length)
      .filter(i => md5hex(a.substring(i - W, i)).charAt(0) == '0')
    val interior = {
      val bounds = (0 +: cutsA) :+ a.length
      bounds.sliding(2).collect {
        case Seq(s, e) if s >= W && e > s => md5hex(a.substring(s, e)).take(16)
      }.toSet
    }
    assert(interior.nonEmpty, "fixture too short to have interior chunks")
    val ca = engineChunks(a).toSet
    val cb = engineChunks(b).toSet
    assert(interior.subsetOf(ca) && interior.subsetOf(cb))
  }

  test("stats: duplicated docs share all chunks, a disjoint-alphabet doc " +
    "shares none; partitioning-invariant") {
    val rnd = new scala.util.Random(13)
    def soup(alpha: String, n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val shared = soup("abcdefg ", 300)
    val df = Seq(
      (1L, shared), (2L, shared),          // exact twins
      (3L, soup("xyzuvw ", 300))           // disjoint alphabet
    ).toDF("doc_id", "text")
    def key(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = key(CdcDedup.stats(df, "doc_id", "text", W))
    val n1 = refChunks(shared).size.toLong
    assert(got(0) == ((1L, n1, n1)) && got(1) == ((2L, n1, n1)))
    assert(got(2)._3 == 0L)
    assert(got == key(CdcDedup.stats(df.repartition(7), "doc_id", "text", W)))
  }

  test("pairs: near-dup twins pair up on shared cold chunks; a chunk in " +
    "more than hotCap docs is a stop-chunk and generates no pairs") {
    val rnd = new scala.util.Random(29)
    def soup(alpha: String, n: Int) =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val y = soup("abcdefg ", 400)
    val boiler = soup("mnopqr ", 400) // boilerplate shared by ALL docs below
    val df = Seq(
      (1L, y),                                  // original
      (2L, "an inserted header " + y),          // shifted near-dup of 1
      (3L, boiler + soup("stuvwx ", 200)),      // boilerplate carriers...
      (4L, boiler + soup("stuvwx ", 200)),
      (5L, boiler + soup("stuvwx ", 200))
    ).toDF("doc_id", "text")
    // hotCap=2: boiler chunks live in docs 3,4,5 (nd=3 > 2) → stop-chunks;
    // y's interior chunks live in docs 1,2 (nd=2) → pair evidence
    val got = CdcDedup.pairs(df, "doc_id", "text", W, hotCap = 2,
        minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected only the (1,2) twin pair, got $got")
    // shared count ≥ interior chunks of y (cold by construction, derived
    // from the reference cut rule — same derivation as the shift test),
    // minus any hash that happens to also occur in another doc (e.g. an
    // all-space chunk shared across alphabets would be hot, not cold)
    val cuts = (W to y.length)
      .filter(i => md5hex(y.substring(i - W, i)).charAt(0) == '0')
    val interior = {
      val bounds = (0 +: cuts) :+ y.length
      bounds.sliding(2).collect {
        case Seq(s, e) if s >= W && e > s => md5hex(y.substring(s, e)).take(16)
      }.toSet
    }
    val others = df.collect().filter(_.getLong(0) >= 3L)
      .flatMap(r => refChunks(r.getString(1))).toSet
    val interiorCold = interior -- others
    assert(interiorCold.size >= 3, "fixture too weak — widen y")
    assert(got.head._3 >= interiorCold.size.toLong)
    // suppressing the cap admits boilerplate pairs among 3,4,5
    val uncapped = CdcDedup.pairs(df, "doc_id", "text", W, hotCap = 99,
        minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((3L, 4L), (3L, 5L), (4L, 5L)).subsetOf(uncapped))
  }
}
