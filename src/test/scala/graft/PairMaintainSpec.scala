package graft

import graft.extra.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained near-dup PAIR artifact ([[Dedup.trainedPairs]] /
  * [[Dedup.appendPairs]]): O(batch) appends must serve EXACTLY the pair
  * table a fresh build over the grown corpus would produce — for the exact
  * variant via the ONE-SIDED prefix-filter probe (valid under any token
  * ordering, so corpus prefixes are never recomputed as global df drifts),
  * for the LSH variant because band signatures are per-document. Plus the
  * segment discipline (prior segments untouched on append; compaction
  * preserves content) and the refresh-invalidation wiring.
  */
class PairMaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Ten-token docs: at threshold 0.8 a 9-of-10-token overlap (jac 9/11 ≈
  // 0.818) pairs, an 8-of-10 (8/12 ≈ 0.67) does not. Tokens chosen so
  // docs 1/2 are exact set-dups, 3 is a 9/10 near-dup of 1, 4 is far.
  private def doc(toks: Seq[String]) = toks.mkString(" ")
  private val base = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private val corpusRows = Seq(
    1L -> doc(base),
    2L -> doc(base.reverse), // same SET, different order — exact set-dup
    3L -> doc(base.take(9) :+ "lambda"), // 9/10 overlap with 1 and 2
    4L -> doc(Seq("mu", "nu", "xi", "omicron", "pi",
      "rho", "sigma", "tau", "upsilon", "phi")))
  // batch: 11 duplicates corpus doc 4 (cross pair), 12/13 duplicate each
  // other (within-batch pair), 14 is unique, 15 near-dups corpus doc 1
  private val batchRows = Seq(
    11L -> doc(Seq("mu", "nu", "xi", "omicron", "pi",
      "rho", "sigma", "tau", "upsilon", "phi")),
    12L -> doc(Seq("chi", "psi", "omega", "one", "two",
      "three", "four", "five", "six", "seven")),
    13L -> doc(Seq("chi", "psi", "omega", "one", "two",
      "three", "four", "five", "six", "seven")),
    14L -> doc(Seq("eight", "nine", "ten", "eleven", "twelve",
      "thirteen", "fourteen", "fifteen", "sixteen", "seventeen")),
    15L -> doc(base.take(9) :+ "pi")) // 9/10 with 1/2; also shares pi w/ 4
  private def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def pairSet(p: org.apache.spark.sql.DataFrame) =
    p.select("id_a", "id_b", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("exact variant: grown artifact ≡ fresh pair build over corpus ∪ batch") {
    val key = "pairspec-exact"
    Dedup.resetPairs(spark, key)
    val corpus = df(corpusRows)
    val batch = df(batchRows)
    val built = Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key)
    assert(pairSet(built) == pairSet(Dedup.jaccardPairs(corpus, "doc_id", "text", 0.8)))
    assert(Dedup.appendPairs(batch, "doc_id", "text", 0.8, key))
    val grown = Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key)
    val fresh = Dedup.jaccardPairs(corpus.unionByName(batch), "doc_id", "text", 0.8)
    assert(pairSet(grown) == pairSet(fresh),
      "grown pair table must equal a fresh build over the grown corpus")
    // the fixture exercises all three pair classes
    val ids = pairSet(grown).map(t => (t._1, t._2))
    assert(ids.contains((4L, 11L)), "cross batch×corpus pair")
    assert(ids.contains((12L, 13L)), "within-batch pair")
    assert(ids.contains((1L, 2L)), "pre-existing corpus pair survives")
    Dedup.resetPairs(spark, key)
  }

  test("lsh variant: grown artifact ≡ fresh LSH pair build over corpus ∪ batch") {
    val key = "pairspec-lsh"
    Dedup.resetPairs(spark, key)
    val corpus = df(corpusRows)
    val batch = df(batchRows)
    Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key, lsh = true)
    assert(Dedup.appendPairs(batch, "doc_id", "text", 0.8, key, lsh = true))
    val grown = Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key, lsh = true)
    val fresh = Dedup.minhashLshPairs(
      corpus.unionByName(batch), "doc_id", "text", 0.8)
    assert(pairSet(grown) == pairSet(fresh),
      "band signatures are per-doc, so the grown LSH table must be identical")
    Dedup.resetPairs(spark, key)
  }

  test("append leaves prior segments' frames untouched (reference identity)") {
    val key = "pairspec-segs"
    Dedup.resetPairs(spark, key)
    Dedup.trainedPairs(df(corpusRows), "doc_id", "text", 0.8, key)
    val before = Dedup.pairSegmentsOf(spark, key)
    assert(before.size == 1 && Dedup.pairSegmentCount(spark, key) == 1)
    assert(Dedup.appendPairs(df(batchRows), "doc_id", "text", 0.8, key))
    val after = Dedup.pairSegmentsOf(spark, key)
    assert(after.size == 2)
    assert(after.head.pairs eq before.head.pairs)
    assert(after.head.toks eq before.head.toks)
    assert(after.head.probe eq before.head.probe,
      "an append must not re-materialize existing corpus segments")
    // the new segment holds ONLY the batch's own documents
    assert(after(1).toks.count() == batchRows.size)
    Dedup.resetPairs(spark, key)
  }

  test("compaction past maxSegments preserves pairs exactly") {
    val key = "pairspec-compact"
    Dedup.resetPairs(spark, key)
    val corpus = df(corpusRows)
    val b1 = df(batchRows.take(2))
    val b2 = df(batchRows.drop(2))
    Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key)
    assert(Dedup.appendPairs(b1, "doc_id", "text", 0.8, key, maxSegments = 2))
    assert(Dedup.pairSegmentCount(spark, key) == 2)
    assert(Dedup.appendPairs(b2, "doc_id", "text", 0.8, key, maxSegments = 2))
    assert(Dedup.pairSegmentCount(spark, key) == 1, "3 > 2 must compact")
    val grown = Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key)
    val fresh = Dedup.jaccardPairs(
      corpus.unionByName(b1).unionByName(b2), "doc_id", "text", 0.8)
    assert(pairSet(grown) == pairSet(fresh))
    // a compacted artifact keeps serving appends
    val b3 = Seq(21L -> doc(base)).toDF("doc_id", "text")
    assert(Dedup.appendPairs(b3, "doc_id", "text", 0.8, key, maxSegments = 2))
    val ids = pairSet(Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key))
      .map(t => (t._1, t._2))
    assert(ids.contains((1L, 21L)) && ids.contains((2L, 21L)))
    Dedup.resetPairs(spark, key)
  }

  test("fixture-scale: grown ≡ fresh on sf0.001 documents, both variants") {
    // real corpus text (near-dup families planted by the fixture
    // generator), a 3-batch growth path — the admission cadence a service
    // actually runs, at DedupSpec's fixture scale
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val corpus = docs.filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 125)
    val b2 = docs.filter(col("doc_id") >= 125 && col("doc_id") < 150)
    val all = docs.filter(col("doc_id") < 150)
    for ((lsh, key) <- Seq((false, "pairspec-fix-exact"), (true, "pairspec-fix-lsh"))) {
      Dedup.resetPairs(spark, key)
      Dedup.trainedPairs(corpus, "doc_id", "text", 0.95, key, lsh = lsh)
      assert(Dedup.appendPairs(b1, "doc_id", "text", 0.95, key, lsh = lsh))
      assert(Dedup.appendPairs(b2, "doc_id", "text", 0.95, key, lsh = lsh))
      val grown = pairSet(Dedup.trainedPairs(corpus, "doc_id", "text", 0.95, key, lsh = lsh))
      val fresh = pairSet(
        if (lsh) Dedup.minhashLshPairs(all, "doc_id", "text", 0.95)
        else Dedup.jaccardPairs(all, "doc_id", "text", 0.95))
      assert(fresh.nonEmpty, s"fixture must contain 0.95 near-dups (lsh=$lsh)")
      assert(grown == fresh, s"grown != fresh at fixture scale (lsh=$lsh)")
      Dedup.resetPairs(spark, key)
    }
  }

  test("appendPairs is replay-idempotent per document") {
    val key = "pairspec-replay"
    Dedup.resetPairs(spark, key)
    val corpus = df(corpusRows)
    val batch = df(batchRows)
    Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key)
    assert(Dedup.appendPairs(batch, "doc_id", "text", 0.8, key))
    val grown = pairSet(Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key))
    val segs = Dedup.pairSegmentCount(spark, key)
    // full replay: no new segment, no self-pairs, artifact unchanged
    assert(Dedup.appendPairs(batch, "doc_id", "text", 0.8, key))
    assert(Dedup.pairSegmentCount(spark, key) == segs)
    assert(pairSet(Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key)) == grown)
    // partial replay (one present doc + one new near-dup of it): only the
    // new doc's pairs append, still no (d, d) self-pair
    val partial = df(batchRows.take(1) :+ (31L -> batchRows.head._2))
    assert(Dedup.appendPairs(partial, "doc_id", "text", 0.8, key))
    val after = pairSet(Dedup.trainedPairs(corpus, "doc_id", "text", 0.8, key))
    assert(after.map(t => (t._1, t._2)).contains((11L, 31L)))
    assert(after.forall(t => t._1 != t._2), "no self-pairs ever")
    assert(after == pairSet(Dedup.jaccardPairs(
      corpus.unionByName(batch).unionByName(df(Seq(31L -> batchRows.head._2))),
      "doc_id", "text", 0.8)), "grown ≡ fresh after a partial replay")
    Dedup.resetPairs(spark, key)
  }

  test("appendPairs is a no-op without a memoized artifact") {
    assert(!Dedup.appendPairs(df(batchRows), "doc_id", "text", 0.8,
      "pairspec-unbuilt"))
    assert(Dedup.pairSegmentCount(spark, "pairspec-unbuilt") == 0)
  }

  test("admitStreamMaintained(gramSpecs) folds admitted docs' gram counts " +
    "in under the writer-scoped ledger") {
    val corpus = df(Seq(1L -> doc(base), 2L -> doc(Seq("mu", "nu", "xi",
      "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi"))))
    // fresh text (admitted at 0.9) that shares a 5-gram with doc 1
    val batch = Seq(20L -> doc(base.take(5) ++ Seq("q1", "q2", "q3", "q4",
      "q5"))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("gramspec-stream").toString
    batch.coalesce(1).write.mode("append").parquet(dir)
    val idxKey = "gramspec-stream-idx"
    val gKey = "gramspec-stream-grams"
    Dedup.resetIndex(spark, idxKey)
    Dedup.resetIndex(spark, gKey)
    Dedup.trainedGramIndex(corpus, "doc_id", "text", gKey, 5)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = graft.streaming.CorpusStream.admitStreamMaintained(
      stream, corpus, idxKey, threshold = 0.9,
      gramSpecs = Seq((gKey, 5))) { (_, _) => () }
    try q.processAllAvailable() finally { q.stop(); Dedup.resetIndex(spark, idxKey) }
    def ghCounts(g: org.apache.spark.sql.DataFrame) = g
      .groupBy("gh").agg(org.apache.spark.sql.functions.sum("n_docs")
        .as("nd"), org.apache.spark.sql.functions.sum("n_occ").as("no"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(ghCounts(Dedup.trainedGramIndex(corpus, "doc_id", "text", gKey, 5))
      == ghCounts(Dedup.gramStats(corpus.unionByName(batch),
        "doc_id", "text", 5)),
      "maintained gram artifact must equal a fresh build over the union")
    Dedup.resetIndex(spark, gKey)
  }

  test("admitStreamMaintained(pairsSpecs) folds admitted docs' pairs in") {
    // the gate admits at 0.9 (doc 20 duplicates nothing that closely) while
    // the PAIR artifact tracks 0.5 near-dups — so the admitted doc MUST
    // surface as a pair with corpus doc 1 afterwards, with zero caller
    // wiring beyond the spec tuple
    val corpus = df(Seq(
      1L -> doc(base),
      2L -> doc(Seq("mu", "nu", "xi", "omicron", "pi",
        "rho", "sigma", "tau", "upsilon", "phi"))))
    // 7/10 overlap with doc 1 → jac 7/13 ≈ 0.538: pairs at 0.5, admitted at 0.9
    val batch = Seq(20L -> doc(base.take(7) ++ Seq("aa", "bb", "cc")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pairspec-stream").toString
    batch.coalesce(1).write.mode("append").parquet(dir)
    val idxKey = "pairspec-stream-idx"
    val pKey = "pairspec-stream-pairs"
    Dedup.resetIndex(spark, idxKey)
    Dedup.resetPairs(spark, pKey)
    Dedup.trainedPairs(corpus, "doc_id", "text", 0.5, pKey)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = graft.streaming.CorpusStream.admitStreamMaintained(
      stream, corpus, idxKey, threshold = 0.9,
      pairsSpecs = Seq((pKey, 0.5, false))) { (_, _) => () }
    try q.processAllAvailable() finally { q.stop(); Dedup.resetIndex(spark, idxKey) }
    assert(Dedup.pairSegmentCount(spark, pKey) == 2,
      "the admitted batch must have appended a pair segment")
    val grown = pairSet(Dedup.trainedPairs(corpus, "doc_id", "text", 0.5, pKey))
    val fresh = pairSet(Dedup.jaccardPairs(
      corpus.unionByName(batch), "doc_id", "text", 0.5))
    assert(grown == fresh && grown.map(t => (t._1, t._2)).contains((1L, 20L)),
      s"maintained pairs must cover the admitted doc: $grown")
    Dedup.resetPairs(spark, pKey)
  }

  test("refreshDataset drops the refreshed table's dedup-family artifacts") {
    import graft.search.Sketches
    // isolated lake copy (the SearchSpec refresh pattern) so the shared
    // sf0.001 sketch cache entry is untouched
    val tmp = java.nio.file.Files.createTempDirectory("graft-pairs-refresh").toString
    val src = java.nio.file.Paths.get(SparkTestSession.sf0001)
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.copy(p, java.nio.file.Paths.get(tmp, p.getFileName.toString))
    }
    val docs = Tables.load(spark, tmp, "documents").filter(col("doc_id") < 50)
    Dedup.trainedPairs(docs, "doc_id", "text", 0.9, s"$tmp#pairs:documents@0.9")
    Dedup.trainedPairs(docs, "doc_id", "text", 0.9,
      s"$tmp#pairs_lsh:documents@0.9", lsh = true)
    Dedup.trainedIndex(docs, "doc_id", "text", s"$tmp#dedup_idx:documents")
    assert(Dedup.pairSegmentCount(spark, s"$tmp#pairs:documents@0.9") == 1)
    assert(Dedup.segmentCount(spark, s"$tmp#dedup_idx:documents") == 1)
    // refreshing ANOTHER table must not touch the documents artifacts
    Sketches.refreshDataset(spark, tmp, "nation")
    assert(Dedup.pairSegmentCount(spark, s"$tmp#pairs:documents@0.9") == 1)
    assert(Dedup.pairSegmentCount(spark, s"$tmp#pairs_lsh:documents@0.9") == 1)
    assert(Dedup.segmentCount(spark, s"$tmp#dedup_idx:documents") == 1)
    // refreshing documents drops the whole derived family
    Sketches.refreshDataset(spark, tmp, "documents")
    assert(Dedup.pairSegmentCount(spark, s"$tmp#pairs:documents@0.9") == 0)
    assert(Dedup.pairSegmentCount(spark, s"$tmp#pairs_lsh:documents@0.9") == 0)
    assert(Dedup.segmentCount(spark, s"$tmp#dedup_idx:documents") == 0)
    Sketches.reset(spark, tmp)
  }
}
