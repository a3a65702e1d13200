package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Census of every no-partition window in the library (VERDICT r17 #8): a
  * `Window.orderBy` without `partitionBy` moves ALL rows to one task, which
  * is a scale-killer unless the frame is provably bounded. This spec (a)
  * pins the exact set of such sites in source — a new one fails the census
  * until it is proven bounded and allowlisted here with its reason — and
  * (b) asserts the two non-obvious bounds behaviorally: weightedSample's
  * global rank is WindowGroupLimit-pruned (each map partition forwards at
  * most k rows), and packSequences' global window only plans under the
  * 64 MB gate (the two-level bucketed cumsum takes over past it,
  * CorpusOpsSpec proves them value-identical).
  */
class WindowCensusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("every no-partition Window site is known and bounded") {
    val root = new java.io.File("src/main/scala")
    def scalaFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(scalaFiles)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val sites = for {
      f <- scalaFiles(root)
      // decode with replacement (String's UTF-8 path never throws) — a few
      // sources carry non-ASCII comment glyphs
      line <- new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
      if line.contains("Window.orderBy")
    } yield s"${f.getPath.stripPrefix("src/main/scala/")}"
    // The allowlist pins FILES (line numbers churn), with the boundedness
    // argument for each. A new no-partition window in a NEW file fails
    // here; one in a listed file still deserves review, which is why the
    // per-file expected counts are pinned too.
    val expected = Map(
      // qualityNorm wAll: input is groupBy(quality) over 6-decimal-rounded
      // quality — a <= 1e6+1-row GRID, never corpus-sized.
      // packSequences: global window only under the 64 MB size gate; the
      // bucketed path partitions on pid (plans/r18/corpus_pack_bucketed).
      // budgetSelect wb: input is groupBy(qb), <= `buckets` (256) rows.
      // weightedSample w: rk <= k filter => WindowGroupLimit map-side
      // pruning, asserted below.
      "graft/extra/CorpusOps.scala" -> 4,
      // kmeans seed order: over .limit(k) rows by construction.
      "graft/extra/Clustering.scala" -> 1,
      // IVF centroid ranks over .limit(maxNlist); PQ codebook index over
      // .limit(ksub) — both tiny by construction.
      "graft/extra/EmbeddingKnn.scala" -> 2)
    val got = sites.groupBy(identity).view.mapValues(_.size).toMap
    assert(got == expected,
      s"no-partition window census drifted: $got vs $expected — prove the " +
        "new site bounded (grid-sized input, limit(k), size gate, or " +
        "WindowGroupLimit pruning) and update the allowlist with the reason")
  }

  test("weightedSample's global rank window is WindowGroupLimit-pruned") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val plan = graft.extra.CorpusOps
      .weightedSample(docs, "doc_id", length(col("text")).cast("double"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") ||
      plan.contains("TakeOrderedAndProject"),
      "rk <= k must prune below the global window (WindowGroupLimit " +
        "map-side pruning, or the rank-limit pushdown's " +
        s"TakeOrderedAndProject) so no task sorts the corpus; got:\n$plan")
  }

  test("packSequences only plans the global window under the size gate") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    // fixture is far below the 64 MB gate: global window, no cache pin
    val gated = graft.extra.CorpusOps.packSequences(docs, "doc_id", "text")
    assert(gated.queryExecution.executedPlan.toString.contains("Window"))
    // forced two-level path: the corpus-sized window partitions on pid
    val bucketed = graft.extra.CorpusOps
      .packSequencesBucketed(docs, "doc_id", "text", 2048L, 8)
    val wins = bucketed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    graft.Caching.release()
    val overDocs = wins.filter(w => w.partitionSpec.isEmpty &&
      w.child.collectFirst {
        case r if r.nodeName.contains("LogicalRDD") => r }.isEmpty)
    // the only no-partition windows left are over the md5-sampled
    // boundary subtree (~1/256 of DISTINCT doc ids) and the buckets-sized
    // offsets frame — never the full per-document stream
    overDocs.foreach { w =>
      val hasSampleFilter = w.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("md5") => f }.nonEmpty
      assert(hasSampleFilter || w.toString.contains("ptotal"),
        s"unbounded no-partition window in bucketed packSequences:\n$w")
    }
  }
}
