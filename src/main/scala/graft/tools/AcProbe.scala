package graft.tools

import graft.extra.Signals
import org.apache.spark.sql.functions._

/** A/B: Aho-Corasick blocklist gate vs the naive per-term `contains`
  * composition, as the blocklist grows. The naive form is O(terms × bytes)
  * per row; the automaton is O(bytes + matches) — the probe measures where
  * the gap opens and checks value equality on every draw.
  *
  * Usage: runMain graft.tools.AcProbe [sfDir] [termCounts...]
  */
object AcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session("acprobe")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = if (args.length > 1) args.tail.map(_.toInt).toSeq
                 else Seq(16, 128, 1024, 4096)
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").cache()
    println(s"PROBE docs=${docs.count()}")

    // deterministic phrase blocklist over the fixture vocabulary: random
    // three-word phrases (mostly absent — the worst case for the naive
    // form, which must scan the whole doc per term to conclude "no hit").
    // Drawn UNTIL counts.max distinct phrases exist (ADVICE r16: a fixed
    // draw count left ~10% collisions at 4096, silently under-filling the
    // larger blocklists the printed labels claimed).
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "window", "spark", "order",
      "data", "column", "join", "small", "line", "customer", "query", "big",
      "filter", "group", "the")
    val rnd = new scala.util.Random(99)
    // counts is a CLI arg: the draw-until-distinct loop below can only
    // terminate if the requested blocklist fits the reachable phrase space
    // (ADVICE r17 — without this require the loop spins forever and the
    // under-fill require after it is unreachable)
    require(counts.max <= vocab.size.toLong * vocab.size * vocab.size,
      s"counts.max=${counts.max} exceeds the ${vocab.size}^3 distinct " +
        "3-word phrases this vocab can produce")
    val allTerms = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      while (seen.size < counts.max)
        seen += s"${vocab(rnd.nextInt(vocab.length))} ${vocab(rnd.nextInt(vocab.length))} ${vocab(rnd.nextInt(vocab.length))}"
      seen.toSeq
    }
    require(allTerms.size >= counts.max, "term generation under-filled")

    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum("n_terms_hit"), sum("keep")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // past ~4k terms the naive form's generated code OOMs the janino
    // compiler itself (10k Contains nodes in one method — measured:
    // OutOfMemoryError in UnitCompiler.buildLocalVariableMap on a 24g
    // heap), so the A/B baseline stops there and larger sizes report the
    // AC side alone — which is the point at that scale.
    val naiveCap = 4096
    for (n <- counts) {
      val terms = allTerms.take(n)
      var acV: (Long, Long) = null
      var nvV: (Long, Long) = null
      // interleaved min-of-2 per form
      val acT = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        acV = agg(Signals.blocklist(docs, "doc_id", "text", terms))
        (System.nanoTime - t0) / 1e9
      }.min
      if (n <= naiveCap) {
        val nvT = (1 to 2).map { _ =>
          val t0 = System.nanoTime
          nvV = agg(Signals.blocklistNaive(docs, "doc_id", "text", terms))
          (System.nanoTime - t0) / 1e9
        }.min
        require(acV == nvV, s"VALUE MISMATCH at $n terms: $acV vs $nvV")
        println(f"PROBE terms=$n%5d ac=$acT%7.2fs naive=$nvT%7.2fs " +
          f"ratio=${nvT / acT}%6.2f hits=${acV._1} keeps=${acV._2}")
      } else
        println(f"PROBE terms=$n%5d ac=$acT%7.2fs naive=SKIPPED (codegen " +
          f"OOM past $naiveCap) hits=${acV._1} keeps=${acV._2}")
    }
    spark.stop()
  }
}
