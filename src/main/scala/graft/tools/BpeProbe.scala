package graft.tools

import graft.Tables
import graft.extra.TextStats
import org.apache.spark.sql.functions._

/** Same-JVM A/B + plan evidence for the BPE greedy loop's driver-side gate
  * (round 18): `trainedMergesRun(forceLocal=Some(false))` replays the old
  * shape (8 sequential explode+agg+argmax ACTIONS over the pinned word
  * table) against `Some(true)` (one word-table collect + a driver loop).
  * Merge-table equality is asserted first — the spec's property, re-proven
  * on the real corpus. The plan dump shows what remains distributed under
  * the gate: the word-table aggregation (collected once) and, for contrast,
  * the per-round pair-count plan the old path paid 8 times.
  * Usage: runMain graft.tools.BpeProbe [sfDir] [reps]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Prof.session("bpeprobe")
    val docs = Tables.load(spark, dir, "documents")
    val loc = TextStats.trainedMergesRun(docs, "text", 8, Some(true))
    val dist = TextStats.trainedMergesRun(docs, "text", 8, Some(false))
    require(loc == dist,
      s"driver-local and distributed merge tables diverge:\n$loc\nvs\n$dist")
    println(s"== merge tables identical over ${loc.size} rounds")
    for (rep <- 1 to reps) {
      Prof.time(s"distributed 8-round loop rep=$rep")(
        TextStats.trainedMergesRun(docs, "text", 8, Some(false)))
      Prof.time(s"driver-local loop rep=$rep")(
        TextStats.trainedMergesRun(docs, "text", 8, Some(true)))
    }
    // the word table both paths build (the local path's ONLY distributed
    // job — counted for the gate, then collected)
    val spaced = concat(lit(" "),
      concat_ws(" ", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")),
      lit(" "))
    val words = docs
      .select(explode(graft.functions.TextTokens.lowerSpaceTokens(col("text")))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .select(spaced.as("ws"), col("wcnt"))
    println("===== word-table plan (collected once under the gate) =====")
    words.explain("formatted")
    // the per-round pair-count plan the distributed path runs 8x (round 1
    // shown; later rounds differ only in the merged word strings)
    val pairs = words
      .select(col("wcnt"), split(trim(col("ws")), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("wcnt"), explode(expr(
        "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS l, t[i] AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("wcnt").as("cnt"))
      .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
      .limit(1)
    println("===== per-round argmax plan (the old path paid this 8x) =====")
    pairs.explain("formatted")
    spark.stop()
  }
}
