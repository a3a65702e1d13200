package graft

import graft.search.{Bm25, CombinedScorer, DistanceJoin, Matcher}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Hand-checkable sketch table (FIXTURES.md §B.2): query Q with one column,
    * candidates at known distances 0, 3, 4, 5.
    */
  private def sketch = Seq(
    ("Q", "qc", "Numeric", Seq(0.0, 0.0)),
    ("A", "a1", "Numeric", Seq(0.0, 0.0)),  // dist 0 (excluded from kth)
    ("B", "b1", "Numeric", Seq(3.0, 0.0)),  // dist 3
    ("C", "c1", "Numeric", Seq(0.0, 4.0)),  // dist 4
    ("D", "d1", "Numeric", Seq(3.0, 4.0)),  // dist 5
    ("E", "e1", "Categorical", Seq(1.0, 1.0)) // different type → never joined
  ).toDF("dataset_id", "col_name", "col_type", "vector")

  test("knn kth semantics (content_search.py:88-96: position L counts zeros)") {
    // sorted distances incl. zeros: [0, 3, 4, 5]; L=2 → vals[1] = 3 ≠ 0 → kth=3
    val r = DistanceJoin.knn(sketch, "Q", m = 10, l = 2).collect()
    assert(r.map(_.getAs[String]("c_dataset")).toSet == Set("A", "B", "C", "D"))
    val kth = r.head.getAs[Double]("kth")
    assert(kth == 3.0, s"kth should be vals[L-1] counting zeros (3.0), got $kth")
    val simByCand = r.map(x => x.getAs[String]("c_dataset") -> x.getAs[Double]("sim")).toMap
    assert(math.abs(simByCand("B") - math.exp(-0.01 * 3.0 / 3.0)) < 1e-6)
    assert(simByCand("A") == 1.0) // dist 0 → exp(0)

    // L=1: vals[0] = 0 → advance past zeros → kth = 3
    val r1 = DistanceJoin.knn(sketch, "Q", m = 10, l = 1).collect()
    assert(r1.head.getAs[Double]("kth") == 3.0)

    // all-zero list → floor at 1e-12
    import spark.implicits._
    val allZero = Seq(
      ("Q", "qc", "Numeric", Seq(0.0, 0.0)),
      ("Z", "z1", "Numeric", Seq(0.0, 0.0))).toDF("dataset_id", "col_name", "col_type", "vector")
    val rz = DistanceJoin.knn(allZero, "Q", m = 10, l = 2).collect()
    assert(rz.head.getAs[Double]("kth") == 1e-12)
  }

  test("index build is run-to-run deterministic (fresh build, AQE on)") {
    // Guards the failure class fixed in the bucketed cumsum: two plan
    // subtrees consuming a sampled partition id disagreed when AQE stage
    // reuse missed over cached children, losing/NOISING sketch rows
    // nondeterministically. Two FRESH builds (bypassing the session cache)
    // must be row-for-row identical, vectors included.
    def build() = graft.search.Sketches.all(spark, SparkTestSession.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getSeq[Double](3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val a = build()
    assert(a.nonEmpty)
    assert(build() == a)
  }

  test("knn plan: kth rides the ranking window — one broadcast, no join-back") {
    // the scorer's only broadcast is the query side; n_cand and kth are
    // whole-partition window aggregates on the ranking's own q_col
    // partitioning. A second broadcast or any join after the window would
    // mean the aggregate+broadcast-join-back shape crept back in (each such
    // build subtree re-executes the ranked pipeline as its own job).
    val plan = DistanceJoin.knn(sketch, "Q", m = 10, l = 2)
      .queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("knn: rank ties break on (dataset, col)") {
    val r = DistanceJoin.knn(sketch, "Q", m = 10, l = 2)
      .orderBy("rank").collect().map(_.getAs[String]("c_dataset"))
    assert(r.toSeq == Seq("A", "B", "C", "D"))
  }

  test("weighted + contentScores end-to-end on tiny fixture") {
    val ranked = DistanceJoin.knn(sketch, "Q", m = 10, l = 2)
    val scored = Matcher.contentScores(DistanceJoin.weighted(ranked))
      .collect().map(r => r.getAs[String]("c_dataset") -> r.getAs[Double]("content_score")).toMap
    // single query column, uniform weight 1.0 → score = sim of best edge
    assert(scored("A") == 1.0)
    assert(scored.keySet == Set("A", "B", "C", "D"))
  }

  test("candidateEdges completes the bipartite graph for discovered candidates") {
    // with m=1 only the nearest candidate column makes the ranked list, but
    // the random-access step must still produce edges for every same-type
    // column of each discovered candidate (content_search.py:358-405)
    val ranked = DistanceJoin.knn(sketch, "Q", m = 1, l = 2)
    assert(ranked.count() == 1) // only A
    val edges = DistanceJoin.candidateEdges(sketch, "Q", ranked).collect()
    assert(edges.map(_.getAs[String]("c_dataset")).toSet == Set("A"))
    // sims on completed edges use the ranked kth → identical formula
    assert(edges.forall(e => e.getAs[Double]("sim") > 0 && e.getAs[Double]("sim") <= 1))
  }

  test("knnLsh: candidates are a subset of brute force with identical scores") {
    val brute = DistanceJoin.knn(sketch, "Q", m = 10, l = 2).collect()
      .map(r => (r.getAs[String]("q_col"), r.getAs[String]("c_dataset"),
        r.getAs[String]("c_col")) -> (r.getAs[Double]("dist"), r.getAs[Double]("kth")))
      .toMap
    val lsh = DistanceJoin.knnLsh(sketch, "Q", m = 10, l = 2).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val k = (r.getAs[String]("q_col"), r.getAs[String]("c_dataset"),
        r.getAs[String]("c_col"))
      assert(brute.contains(k), s"LSH pair $k not in brute force")
      assert(brute(k)._1 == r.getAs[Double]("dist"), s"dist mismatch for $k")
    }
  }

  test("bm25 idf decreases with document frequency") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common words here"),
      (3L, "common again there")).toDF("doc_id", "text")
    val s = Bm25.scores(docs, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1L) > s(2L), "doc with the rare term must outscore common-only docs")
  }

  test("combine: missing scores become 0, weighted sum, top-k ordering") {
    val content = Seq(("A", 0.8, Seq.empty[String]), ("B", 0.5, Seq.empty[String]))
      .toDF("c_dataset", "content_score", "matching")
    val meta = Seq(("B", 1.0), ("C", 0.9)).toDF("c_dataset", "metadata_score")
    val got = CombinedScorer.combine(content, meta, 0.5, 0.5, 10)
      .select("c_dataset", "overall_score")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(got.toSeq == Seq("B" -> 0.75, "C" -> 0.45, "A" -> 0.4))
  }

  test("refreshDataset: rebuild-equivalent on same data, picks up new data") {
    import graft.search.Sketches
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getSeq[Double](3).toList)).toSet
    // isolated lake copy so the shared sf0.001 cache entry is untouched
    val tmp = java.nio.file.Files.createTempDirectory("graft-refresh").toString
    val src = java.nio.file.Paths.get(SparkTestSession.sf0001)
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.copy(p, java.nio.file.Paths.get(tmp, p.getFileName.toString))
    }
    val before = rows(Sketches.cachedAll(spark, tmp))
    // refresh from the SAME table: the spliced index must equal the build
    assert(rows(Sketches.refreshDataset(spark, tmp, "customer")) == before)
    assert(rows(Sketches.cachedAll(spark, tmp)) == before, "swap must stick")
    // mutate the lake: double customer balances, refresh, only customer moves
    val mod = Tables.load(spark, SparkTestSession.sf0001, "customer")
      .withColumn("c_acctbal", col("c_acctbal") * 2)
    java.nio.file.Files.delete(java.nio.file.Paths.get(tmp, "customer.parquet"))
    mod.coalesce(1).write.parquet(s"$tmp/customer.parquet")
    val after = rows(Sketches.refreshDataset(spark, tmp, "customer"))
    assert(after.filter(_._1 != "customer") == before.filter(_._1 != "customer"),
      "other datasets' rows must be untouched")
    val balBefore = before.find(r => r._1 == "customer" && r._2 == "c_acctbal").get
    val balAfter = after.find(r => r._1 == "customer" && r._2 == "c_acctbal").get
    assert(balAfter != balBefore, "refreshed vector must reflect the new data")
    assert(after.count(_._1 == "customer") == before.count(_._1 == "customer"))

    // a reader holding a refresh snapshot must survive the NEXT refresh:
    // checkpointed snapshots are reclaimed by the ContextCleaner when
    // unreferenced, never explicitly unpersisted under a live handle
    val snapshot = Sketches.cachedAll(spark, tmp) // the first refresh's checkpoint
    Sketches.refreshDataset(spark, tmp, "nation")
    assert(rows(snapshot) == after,
      "old snapshot handle must stay readable after a subsequent refresh")

    // a refresh that CHANGES THE COLUMN SET must propagate to the metadata
    // corpus and its BM25 artifacts (they are derived from table schemas):
    // pre-build the artifacts, mutate the schema, refresh, and the rebuilt
    // metadata must carry the new column — stale-serving would keep the old
    // catalogue text for the rest of the session
    CombinedScorer.metaStats(spark, tmp) // force-build TF artifact + stats
    val descBefore = CombinedScorer.queryMetaRow(spark, tmp, "customer")._3
    assert(!descBefore.contains("freshly added"))
    // source the rewrite from the ORIGINAL lake — reading from tmp here
    // would make the write below consume files this test just deleted
    val wide = Tables.load(spark, SparkTestSession.sf0001, "customer")
      .withColumn("freshly_added", org.apache.spark.sql.functions.lit(1))
    deleteRecursively(java.nio.file.Paths.get(tmp, "customer.parquet"))
    wide.coalesce(1).write.parquet(s"$tmp/customer.parquet")
    Sketches.refreshDataset(spark, tmp, "customer")
    val descAfter = CombinedScorer.queryMetaRow(spark, tmp, "customer")._3
    assert(descAfter.contains("freshly added"),
      "metadata corpus must rebuild from the refreshed schema")
    val (dlAfter, _) = CombinedScorer.metaStats(spark, tmp)
    val custDl = dlAfter.filter(r => r._1 == "customer" && r._2 == "description")
    assert(custDl.head._3 > 0, "BM25 stats must rebuild over the new corpus")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).forEach(deleteRecursively)
    java.nio.file.Files.deleteIfExists(p)
  }

  test("shared metadata TF artifact scores identically to the inline build") {
    // the session artifact minus a doc_id filter must equal re-tokenizing
    // the filtered corpus — TF is per-doc local, every derived stat
    // (dl, avgdl, df) follows
    val dir = SparkTestSession.sf0001
    val meta = CombinedScorer.datasetMetadata(spark, dir)
    val q = "customer"
    def terms(s: String) =
      s.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSeq
    val qRow = meta.filter(org.apache.spark.sql.functions.col("dataset_id") === q)
      .select("title", "keywords", "description").head()
    val fields = Seq(
      ("title", 1.0 / 3, terms(qRow.getString(0))),
      ("keywords", 1.0 / 3, terms(qRow.getString(1))),
      ("description", 1.0 / 3, terms(qRow.getString(2))))
    import org.apache.spark.sql.functions.col
    val inline = Bm25.multiField(
      meta.filter(col("dataset_id") =!= q).withColumnRenamed("dataset_id", "doc_id"),
      "doc_id", fields).collect().map(_.toSeq).toSet
    graft.Caching.release()
    val shared = Bm25.multiFieldWithTf(
      CombinedScorer.metaTermFreqs(spark, dir).filter(col("doc_id") =!= q),
      fields).collect().map(_.toSeq).toSet
    assert(shared == inline, "artifact path must be value-identical")
  }

  test("search normalizes an arbitrary content/metadata split to sum 1") {
    val dir = SparkTestSession.sf0001
    def rows(wc: Double, wm: Double) = {
      val r = CombinedScorer.search(spark, dir, "customer",
          wContent = wc, wMetadata = wm)
        .collect().map(_.toSeq).toSet
      graft.Caching.release()
      r
    }
    // 2/2 ≡ 0.5/0.5 and 3/1 ≡ 0.75/0.25 (Engine.normalizeSplit semantics);
    // previously non-unit splits threw IllegalArgumentException
    assert(rows(2.0, 2.0) == rows(0.5, 0.5))
    assert(rows(3.0, 1.0) == rows(0.75, 0.25))
  }
}
