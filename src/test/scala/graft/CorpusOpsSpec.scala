package graft

import graft.extra.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("epochManifest: contiguous per-shard token offsets matching epochOrder") {
    import graft.extra.CorpusOps
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val m = CorpusOps.epochManifest(docs, "doc_id", "text", epoch = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(m.length == docs.count())
    // within each shard, walking pos order: start_tok is the running token
    // sum, and the sequence ids follow the concatenate-and-chunk formula
    m.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._3).foreach { case (_, _, _, n, start, sf, sl) =>
        assert(start == cum, "start_tok must be the per-shard running sum")
        assert(sf == math.floor(start / 2048.0).toLong)
        assert(sl == math.floor((cum + n - 1) / 2048.0).toLong)
        cum += n
      }
    }
    // shard/pos agree with epochOrder's assignment for the same epoch
    val eo = CorpusOps.epochOrder(docs, "doc_id", 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    m.foreach { case (id, shard, pos, _, _, _, _) =>
      assert(eo(id) == ((shard, pos)))
    }
    // partitioning invariance
    val re = CorpusOps.epochManifest(docs.repartition(7), "doc_id", "text", 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(re == m.toSet)
  }

  test("budgetSelect fills the budget best-first; two-level cumsum equals flat") {
    import graft.extra.CorpusOps
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val got = asMap(CorpusOps.budgetSelect(docs, "doc_id", "text", 5000L))
    // driver reference: greedy best-first by (quality desc, doc_id)
    val scored = graft.extra.TextStats.stats(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "quality").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]).getOrElse(0.0)))
      .sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    val ref = scored.map { case (id, n, _) =>
      cum += n; id -> ((cum, if (cum <= 5000L) 1L else 0L))
    }.toMap
    assert(got == ref, "budgetSelect must equal the greedy reference")
    assert(got.values.exists(_._2 == 1L) && got.values.exists(_._2 == 0L),
      "fixture budget should split the corpus")
    // bucket-count invariance: buckets=1 degenerates to ONE flat window —
    // the two-level path must be value-identical to it
    val flat = asMap(CorpusOps.budgetSelect(docs, "doc_id", "text", 5000L,
      buckets = 1))
    assert(flat == got)
    // partitioning invariance
    val re = asMap(CorpusOps.budgetSelect(docs.repartition(7), "doc_id",
      "text", 5000L))
    assert(re == got)
  }

  test("pagerankNano matches an in-memory integer reference on random graphs") {
    import graft.extra.GraphOps
    def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val nodes = und.map(_._1).distinct
      val deg = und.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val nN = nodes.size
      var pr = nodes.map(_ -> 1000000000L / nN).toMap
      for (_ <- 1 to 10) {
        val acc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        und.foreach { case (s, d) => acc(d) += pr(s) / deg(s) }
        pr = nodes.map(v => v -> (150000000L / nN + 85L * acc(v) / 100L)).toMap
      }
      pr
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 3 + rnd.nextInt(9)
      val edges = for {
        i <- 0 until n; j <- (i + 1) until n if rnd.nextInt(3) == 0
      } yield (i.toLong, j.toLong)
      if (edges.nonEmpty) {
        val got = GraphOps.pagerankNano(edges.toDF("id_a", "id_b"), "id_a", "id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == reference(edges), s"trial $trial, edges $edges")
      }
    }
  }

  test("weightedSample: deterministic, layout-independent, weight-sensitive") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.weightedSample(df, "doc_id", col("n_chars"), 20)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toList.sorted
    val a = run(docs)
    assert(a.map(_._2).toSet == (1L to 20L).toSet, "dense ranks 1..k")
    assert(run(docs.repartition(7)) == a, "sample must not depend on layout")
    // zero/negative weights can never be sampled
    val withDead = docs.withColumn("n_chars",
      when(col("doc_id") % 2 === 0, lit(0L)).otherwise(col("n_chars")))
    val alive = CorpusOps.weightedSample(withDead, "doc_id", col("n_chars"), 20)
      .collect().map(_.getLong(0))
    assert(alive.forall(_ % 2 == 1), "zero-weight rows must be excluded")
  }

  test("decontaminateBloom equals the exact path (no false negatives)") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val exact = CorpusOps.decontaminate(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = CorpusOps.decontaminateBloom(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    assert(bloom == exact, "bloom prefilter must be lossless after exact verify")
  }

  test("pagerankNano: hub outranks leaves, mass conserved, layout-independent") {
    import graft.extra.GraphOps
    // star: 1 is the hub of 2..6; separate edge 10-11
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (10L, 11L))
      .toDF("id_a", "id_b")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphOps.pagerankNano(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = run(pairs)
    assert(pr.size == 8)
    val leaves = Seq(2L, 3L, 4L, 5L, 6L).map(pr)
    assert(leaves.forall(_ < pr(1L)), s"hub must outrank leaves: $pr")
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
    // the 10-11 pair is internally symmetric and isolated from the star
    assert(pr(10L) == pr(11L))
    // integer mass: starts at 8 * (1e9 DIV 8) = 1e9 exactly; each iteration
    // only leaks bounded floor remainders, never creates mass
    assert(pr.values.sum <= 1000000000L)
    assert(pr.values.sum > 900000000L, s"unexpected mass loss: ${pr.values.sum}")
    assert(run(pairs.repartition(5)) == pr, "must not depend on partitioning")
    // exact integer arithmetic ⇒ the iteration layout and checkpoint cadence
    // are pure performance knobs, never semantics
    def runKnobs(np: Int, ce: Int) =
      GraphOps.pagerankNano(pairs, "id_a", "id_b", numPartitions = np,
        checkpointEvery = ce).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(runKnobs(1, 1) == pr, "numPartitions=1 must match the default")
    assert(runKnobs(8, 3) == pr, "numPartitions=8/checkpointEvery=3 must match")
  }

  test("connected components labels each node with its component minimum") {
    // components: {1,2,3,4} (chain), {10,11}, singleton {20}
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = CorpusOps.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connected components match a union-find reference on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val ids = (0 until n).map(_.toLong)
      val pairs = (1 to n / 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      // reference: plain union-find with min-id labeling
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = ids.map(i => i -> find(i)).toMap
      val got = CorpusOps.connectedComponents(
        ids.toDF("id"), pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial (n=$n, ${pairs.size} edges)")
    }
  }

  test("dedup clusters on fixture docs: reps are cluster minima, partition is total") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
      .filter(col("doc_id") < 150)
    val pairs = graft.extra.Dedup.jaccardPairs(docs, "doc_id", "text", 0.95)
    val rows = CorpusOps.dedupClusters(docs, "doc_id", pairs).collect()
    assert(rows.length == docs.count())
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min == cid,
        s"cluster $cid label is not its min member")
      assert(members.count(_.getAs[Long]("is_rep") == 1L) == 1,
        s"cluster $cid must have exactly one representative")
    }
    // every near-dup pair must land in the same cluster
    val label = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    pairs.select("id_a", "id_b").collect().foreach { r =>
      assert(label(r.getLong(0)) == label(r.getLong(1)))
    }
  }

  test("qualityGate keeps the top (1 - dropFrac) of the corpus") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val n = docs.count()
    val rows = CorpusOps.qualityGate(docs, "doc_id", "text").collect()
    assert(rows.nonEmpty && rows.length <= n)
    val thr = rows.map(_.getAs[Double]("threshold")).distinct
    assert(thr.length == 1, "one corpus-wide threshold")
    assert(rows.forall(_.getAs[Double]("quality") >= thr.head))
    // the gate drops AT MOST dropFrac (ties at the cut survive)
    assert(rows.length >= math.floor(n * 0.9).toInt, s"kept ${rows.length}/$n")
  }

  test("dedupRepresentatives keeps the highest-quality copy, not the min id") {
    import spark.implicits._
    // docs 1 and 2 are near-identical, but 1 is punctuation-ridden: the
    // composite quality score prefers 2, so min-id selection would be wrong
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon!!!???;;;###"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "completely different text")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val rows = CorpusOps.dedupRepresentatives(docs, "doc_id", "text", pairs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("keep")))).toMap
    assert(rows(1L) == ((1L, 0L)), "the noisy copy must lose")
    assert(rows(2L) == ((1L, 1L)), "the clean copy wins despite the larger id")
    assert(rows(3L) == ((3L, 1L)), "singletons keep themselves")
  }

  test("decontaminate flags only docs sharing a 5-gram with the benchmark slice") {
    // ids: 0 and 97 are benchmark (x % 97 == 0); 1 copies 0's phrase, 2 doesn't
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (97L, "one two three four five six"),
      (1L, "prefix alpha beta gamma delta epsilon suffix"),
      (2L, "entirely different words with no shared phrase at all"),
      (3L, "short doc")).toDF("doc_id", "text")
    val got = CorpusOps.decontaminate(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "benchmark docs must not be scored")
    assert(got(1L) == ((1L, 1L))) // shares "alpha beta gamma delta epsilon"
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == ((0L, 0L))) // too short for any 5-gram
  }

  test("repetition metrics: hand-computed repeated doc and degenerate docs") {
    val docs = Seq(
      (1L, "ab ab ab ab"),   // 4 tokens, 1 distinct; top 2-gram "ab ab" ×3
      (2L, "all words here differ"),
      (3L, "")).toDF("doc_id", "text")
    val got = CorpusOps.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L)._1 == 0.75) // 1 - 1/4
    assert(got(1L)._2 == math.rint(3.0 * 5 / 11 * 1e6) / 1e6) // 3×len("ab ab")/11
    assert(got(2L)._1 == 0.0)
    assert(got(3L) == ((0.0, 0.0, 0.0)))
  }

  test("corpus mix: deterministic sample, quota respected, best-first within group") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val got = CorpusOps.corpusMix(docs, samplePct = 50, quota = 20)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("rk") <= 20L))
    // deterministic: a second run returns the identical row set
    val again = CorpusOps.corpusMix(docs, samplePct = 50, quota = 20).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // within a group, ranks strictly follow n_chars desc
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .foreach { case (_, g) =>
        val sorted = g.sortBy(_.getAs[Long]("rk"))
        assert(sorted.sliding(2).forall {
          case Array(a, b) => a.getAs[Long]("n_chars") >= b.getAs[Long]("n_chars")
          case _ => true
        })
      }
  }

  test("build2 composes its stages: every gate's own verdict holds on the output") {
    import graft.extra.{CorpusPipeline, EmbeddingKnn, TextStats}
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val emb = Tables.load(spark, SparkTestSession.sf0001, "embeddings")
    val out = CorpusPipeline.build2(docs, emb).collect()
    assert(out.nonEmpty && out.length < docs.count(), "gates must bite")
    // stage verdicts recomputed independently
    val kept = TextStats.fingerprint(docs, "doc_id", "text")
      .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val semKeep = EmbeddingKnn.semanticDedup(emb).filter(col("keep") === 1)
      .collect().map(_.getLong(0)).toSet
    val split = CorpusOps.splitAssignBy(docs, "doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      assert(kept(id), s"$id must be a fingerprint canonical")
      assert(semKeep(id), s"$id must survive semantic dedup")
      assert(r.getDouble(4) >= 0.1, s"$id must clear the percentile gate")
      assert(r.getString(5) == split(id), s"$id split must match splitAssignBy")
    }
  }

  test("qualityNorm: percentiles are rank-consistent per group and globally") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val rows = CorpusOps.qualityNorm(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(x => x._5 >= 0.0 && x._5 <= 1.0
      && x._6 >= 0.0 && x._6 <= 1.0))
    // global percentile matches a direct percent_rank computation
    val qs = rows.map(_._4).sorted
    val n = qs.length
    rows.foreach { case (id, _, _, q, _, pg) =>
      val expected = if (n > 1)
        BigDecimal(qs.count(_ < q).toDouble / (n - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(math.abs(pg - expected) < 2e-6, s"doc $id: $pg vs $expected")
    }
    // within every group, percentile order agrees with quality order and
    // the group minimum sits at 0
    rows.groupBy(x => (x._2, x._3)).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.head._5 == 0.0)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 <= b._5, s"group percentile must be monotone: $a $b")
          if (a._4 == b._4) assert(a._5 == b._5, "ties share a percentile")
        case _ =>
      }
    }
  }

  test("epochOrder: reproducible per-epoch permutations, shard-local ranks") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val n = docs.count()
    val e1 = CorpusOps.epochOrder(docs, "doc_id", 1).collect()
    assert(e1.length == n)
    // (shard, pos) is a total order: per shard, pos is exactly 1..size
    e1.groupBy(_.getLong(2)).foreach { case (shard, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions must be dense from 1")
    }
    assert(e1.map(_.getLong(2)).distinct.length > 1, "uses several shards")
    // epoch 2 is a DIFFERENT permutation of the same docs
    val e2 = CorpusOps.epochOrder(docs, "doc_id", 2).collect()
    val k1 = e1.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val k2 = e2.map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(k1.keySet == k2.keySet)
    assert(k1.exists { case (id, sp) => k2(id) != sp },
      "epochs must be independent permutations")
    // same epoch is partitioning-invariant
    val re = CorpusOps.epochOrder(docs.repartition(7), "doc_id", 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(re == k1)
  }

  test("splitAssignBy: one split per group, group-driven, deterministic") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val r = CorpusOps.splitAssignBy(docs, "doc_id", "source")
    val rows = r.collect()
    assert(rows.length == docs.count())
    // leakage-safety: every group maps to exactly one split
    val perGroup = r.groupBy("group_key")
      .agg(countDistinct("split").as("n")).collect()
    assert(perGroup.nonEmpty && perGroup.forall(_.getAs[Long]("n") == 1L))
    // actually group-driven: some doc's split differs from its per-doc one
    val perDoc = CorpusOps.splitAssign(docs, "doc_id").collect()
      .map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(rows.exists(x => perDoc(x.getLong(0)) != x.getString(2)),
      "group split should disagree with per-doc split somewhere")
    // deterministic under repartition
    val re = CorpusOps.splitAssignBy(docs.repartition(7), "doc_id", "source")
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(re == rows.map(x => x.getLong(0) -> x.getString(2)).toMap)
  }

  test("corpusMixTemperature: sqrt quotas upsample small groups, best-first") {
    import spark.implicits._
    // one dominant source (64 docs) vs a small one (4 docs): proportional
    // shares are 94%/6%, sqrt-temperature shares 80%/20% — the small group
    // must be UP-sampled relative to its corpus share
    val docs = ((1 to 64).map(i => (i.toLong, "en", "big", 100L + i)) ++
      (1 to 4).map(i => (1000L + i, "en", "small", 50L + i)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val got = CorpusOps.corpusMixTemperature(docs, total = 30).collect()
    val byGroup = got.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    // weights 8e6 / 2e6 of 1e7 total -> quotas (30*8/10)=24, (30*2/10)=6;
    // the small group only has 4 docs, so it contributes all of them
    assert(byGroup("big") == 24, s"big got ${byGroup.get("big")}")
    assert(byGroup("small") == 4, s"small got ${byGroup.get("small")}")
    // 4/28 kept >> 4/68 corpus share: relative upsampling held
    // best-first within the group: the 24 longest big docs survive
    val bigKept = got.filter(_.getAs[String]("source") == "big")
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(bigKept == (41L to 64L).toSeq)
    // quotas are floor division: every rank is within its group quota
    assert(got.forall(r => r.getAs[Long]("rk") <= r.getAs[Long]("quota")))
  }

  test("chunkDocuments: stride windows, short tail, single-chunk doc, empty doc") {
    val d1 = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "a b c"),                                   // one short chunk
      (3L, "")                                         // dropped
    ).toDF("doc_id", "text")
    val got = CorpusOps.chunkDocuments(d1, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: starts 0, 48, 96 -> lens 64, 52, 4
    assert(got((1L, 0L)) == ((0L, 64L)))
    assert(got((1L, 1L)) == ((48L, 52L)))
    assert(got((1L, 2L)) == ((96L, 4L)))
    assert(got((2L, 0L)) == ((0L, 3L)))
    assert(!got.keySet.exists(_._1 == 3L), "empty doc must produce no chunks")
    assert(got.size == 4)
  }

  test("corpusRollup: subtotals fold exactly, shares sum to 1 per granularity") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"), (2L, "d e", "en", "s1"),
      (3L, "f g h i", "en", "s2"), (4L, "j", "fr", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = CorpusOps.corpusRollup(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // grand total row
    assert(rows(("<all>", "<all>"))._1 == 4L)
    assert(rows(("<all>", "<all>"))._3 == 10L)
    assert(rows(("<all>", "<all>"))._4 == 1.0)
    // lang subtotal = sum of its (lang, source) rows
    assert(rows(("en", "<all>"))._3 ==
      rows(("en", "s1"))._3 + rows(("en", "s2"))._3)
    // leaf shares sum to ~1 across the leaf granularity
    val leafShare = rows.collect {
      case ((l, s), v) if l != "<all>" && s != "<all>" => v._4
    }.sum
    assert(math.abs(leafShare - 1.0) < 1e-5, s"leaf shares sum $leafShare")
    // 3 leaves + 2 lang subtotals + 1 grand
    assert(rows.size == 6)
  }

  test("snapshotDiff: added/removed/changed/unchanged, jitter-stable identity") {
    val old = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "gone tomorrow")).toDF("doc_id", "text")
    val nw = Seq(
      (1L, "The  cat... sat!"),   // formatting jitter only → unchanged
      (2L, "the dog walked"),     // real edit → changed
      (4L, "brand new doc")).toDF("doc_id", "text")
    val got = CorpusOps.snapshotDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("curationFunnel is partitioning-invariant (1 vs 7 partitions)") {
    import graft.extra.CorpusPipeline
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(key(CorpusPipeline.curationFunnel(docs)) ==
      key(CorpusPipeline.curationFunnel(docs.repartition(7))))
  }

  test("curationFunnel: cumulative monotone attrition, planted gate hits") {
    import graft.extra.CorpusPipeline
    // a clean 50-word doc, its exact duplicate (dies at exact_dedup), and a
    // short doc (dies at the gopher word-count rule)
    val clean = (Seq.fill(24)("the quick") :+ "dogs jump").mkString(" ")
    val docs = Seq(
      (1L, clean, "en", "s1"),
      (2L, clean, "en", "s1"),    // duplicate fingerprint of doc 1
      (3L, "the cat sat", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = CorpusPipeline.curationFunnel(docs).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(rows(0) == (("raw", 3L, 103L, 1.0)))
    // duplicate dropped: 2 docs survive exact_dedup
    assert(rows(1)._1 == "exact_dedup" && rows(1)._2 == 2L)
    // the 3-word doc dies at gopher; the clean doc passes every later gate
    assert(rows(2)._1 == "gopher" && rows(2)._2 == 1L && rows(2)._3 == 50L)
    // docs and tokens never increase down the funnel
    val seq = (0 to 5).map(rows)
    assert(seq.sliding(2).forall { case Seq(a, b) => b._2 <= a._2 && b._3 <= a._3 })
    // pct is docs/raw at 6 decimals
    seq.foreach { case (_, d, _, p) =>
      assert(math.abs(p - math.rint(d.toDouble / 3.0 * 1e6) / 1e6) < 1e-9)
    }
  }

  test("connectedComponentsDF equals GraphX CC on chains, stars, fixture pairs") {
    import spark.implicits._
    def labels(nodes: Seq[Long], pairs: Seq[(Long, Long)],
               df: Boolean): Map[Long, Long] = {
      val n = nodes.toDF("id")
      val p = pairs.toDF("id_a", "id_b")
      val r = (if (df) CorpusOps.connectedComponentsDF(n, p)
               else CorpusOps.connectedComponents(n, p)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Caching.release()
      r
    }
    // long chain (worst case for naive propagation), a hub star with the
    // min at a leaf, two components + singletons, and an empty edge set
    val cases = Seq(
      ((0L to 30L), (0L until 30L).map(i => (i, i + 1))),
      ((0L to 10L), (1L to 10L).map(i => (5L, i)) :+ (7L, 0L)),
      ((0L to 9L), Seq((1L, 2L), (2L, 3L), (6L, 7L), (9L, 6L))),
      ((0L to 4L), Seq.empty[(Long, Long)])
    )
    cases.foreach { case (nodes, pairs) =>
      val want = labels(nodes, pairs, df = false)
      val got = labels(nodes, pairs, df = true)
      assert(got == want, s"pairs=$pairs")
      // labels are component minima
      got.groupBy(_._2).foreach { case (lbl, members) =>
        assert(lbl == members.keys.min)
      }
    }
    // the real fixture pair set
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    val pairs = graft.extra.Dedup.jaccardPairs(docs, "doc_id", "text", 0.95)
    val nodes = docs.select(col("doc_id").as("id"))
    val want = CorpusOps.connectedComponents(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.release()
    val got = CorpusOps.connectedComponentsDF(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caching.release()
    assert(got == want)
  }

  test("connectedComponentsAuto: driver union-find ≡ distributed, both gate sides") {
    import spark.implicits._
    val cases = Seq(
      ((0L to 30L), (0L until 30L).map(i => (i, i + 1))),       // chain
      ((0L to 10L), (1L to 10L).map(i => (5L, i)) :+ (7L, 0L)), // star, min at leaf
      ((0L to 9L), Seq((1L, 2L), (2L, 3L), (6L, 7L), (9L, 6L))),
      ((0L to 4L), Seq.empty[(Long, Long)])                      // singletons only
    )
    cases.foreach { case (nodes, pairs) =>
      val n = nodes.toDF("id"); val p = pairs.toDF("id_a", "id_b")
      val want = CorpusOps.connectedComponentsDF(n, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Caching.release()
      // driver path (budget huge) and forced distributed path (budget 1)
      val fast = CorpusOps.connectedComponentsAuto(n, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slow = CorpusOps.connectedComponentsAuto(n, p, maxDriverRows = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Caching.release()
      assert(fast == want, s"driver path, pairs=$pairs")
      assert(slow == want, s"forced distributed path, pairs=$pairs")
    }
  }

  test("property: components on random graphs — driver union-find and " +
    "distributed loop both equal an independent min-propagation reference") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    // random topologies the fixed cases don't reach: cycles, duplicate
    // edges, self-loops, non-contiguous ids, dense blobs. The reference is
    // a third implementation (naive min-label propagation to fixpoint), so
    // agreement between the two engine paths can't self-certify.
    def refLabels(ids: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val lbl = scala.collection.mutable.Map.empty[Long, Long]
      ids.foreach(i => lbl(i) = i)
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a), lbl(b))
          if (lbl(a) != m) { lbl(a) = m; changed = true }
          if (lbl(b) != m) { lbl(b) = m; changed = true }
        }
      }
      ids.map(i => i -> lbl(i)).toMap
    }
    val genCase = for {
      nIds <- Gen.chooseNum(1, 36)
      ids <- Gen.listOfN(nIds, Gen.chooseNum(0L, 999L)).map(_.distinct)
      nEdges <- Gen.chooseNum(0, 50)
      picks <- Gen.listOfN(nEdges,
        Gen.zip(Gen.chooseNum(0, nIds - 1), Gen.chooseNum(0, nIds - 1)))
      dupEdges <- Gen.oneOf(true, false) // re-deliver half the edge list
    } yield {
      val edges = picks.map { case (i, j) =>
        (ids(i % ids.size), ids(j % ids.size)) } // incl. self-loops
      (ids, if (dupEdges) edges ++ edges.take(edges.size / 2) else edges)
    }
    val prop = Prop.forAllNoShrink(genCase) { case (ids, edges) =>
      val n = ids.toDF("id")
      val p = edges.toDF("id_a", "id_b")
      val want = refLabels(ids, edges)
      val fast = CorpusOps.connectedComponentsAuto(n, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val slow = CorpusOps.connectedComponentsDF(n, p).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.Caching.release()
      val ok = fast == want && slow == want
      if (!ok) System.err.println(
        s"cc mismatch: ids=$ids edges=$edges\n want=$want\n fast=$fast\n slow=$slow")
      ok
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(6)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, s"components property: ${res.status}")
  }

  test("splitLeakage: straddling near-dup pairs counted per split pair") {
    import spark.implicits._
    // pairs (2k, 2k+1) are exact duplicates; pair texts mutually disjoint
    val docs = (0L until 40L).map { id =>
      val p = id / 2
      (id, s"w${p}a w${p}b w${p}c w${p}d w${p}e")
    }.toDF("doc_id", "text")
    val got = CorpusOps.splitLeakage(docs, "doc_id", "text", 0.9).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    graft.Caching.release()

    // local mirror of the md5 split rule
    def split(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val b = java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val want = (0L until 40L by 2).map { a =>
      val (sa, sb) = (split(a), split(a + 1))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.groupBy(identity).map { case (k, v) =>
      k -> ((v.size.toLong, if (k._1 == k._2) 0L else v.size.toLong))
    }
    assert(got == want)
    // the fixture is guaranteed to exercise at least one off-diagonal cell
    assert(want.keys.exists(k => k._1 != k._2),
      "test fixture produced no straddling pair — change ids")
  }

  test("paddingAudit: hand-computed waste for all three strategies") {
    import spark.implicits._
    // token counts 3, 10, 70 with maxLen=16 (70 truncates to 16),
    // bucket=8, packBudget=32
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),
      (2L, Seq.fill(10)("w").mkString(" ")),
      (3L, Seq.fill(70)("w").mkString(" ")),
      (4L, "")                              // empty: excluded everywhere
    ).toDF("doc_id", "text")
    val got = CorpusOps.paddingAudit(docs, "doc_id", "text",
        maxLen = 16, bucket = 8, packBudget = 32).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // used = 3 + 10 + 16 = 29
    // fixed: slots = 3*16 = 48, waste = 19e6/48 = 395833
    assert(got("fixed") == ((3L, 29L, 48L, 395833L)))
    // bucketed: ceil8(3)=8, ceil8(10)=16, ceil8(16)=16 → 40; 11e6/40=275000
    assert(got("bucketed") == ((3L, 29L, 40L, 275000L)))
    // packed: ceil32(29)=32; 3e6/32 = 93750
    assert(got("packed") == ((3L, 29L, 32L, 93750L)))
  }

  test("curriculumShards: bands order by difficulty, schedule is deterministic") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusOps.curriculumShards(d, "doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
    val got = run(docs)
    graft.Caching.release()
    // every non-empty doc scheduled exactly once, bands within [0, 4)
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._2).forall(b => b >= 0 && b < 4))
    assert(got.map(_._2).distinct.length > 1, "fixture must span bands")
    // curriculum order: an easier band's WORST doc is no harder than a
    // harder band's BEST doc (logprob decreases with band index)
    val byBand = got.groupBy(_._2).view.mapValues(_.map(_._6)).toMap
    byBand.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byBand(a).min >= byBand(b).max,
          s"band $a must be uniformly easier than band $b")
      case _ =>
    }
    // positions are dense 1..n per (band, shard)
    got.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // partitioning-independent (the engine-exact integer discipline)
    val re = run(docs.repartition(7))
    graft.Caching.release()
    assert(re.toSet == got.toSet)
  }

  test("packSequences: two-level bucketed cumsum equals the global window") {
    val docs = Tables.load(spark, SparkTestSession.sf0001, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // the public gate picks the single window at fixture size
    val gated = rows(CorpusOps.packSequences(docs, "doc_id", "text"))
    val flat = rows(
      CorpusOps.packSequencesBucketed(docs, "doc_id", "text", 2048L, 1))
    val bucketed = rows(
      CorpusOps.packSequencesBucketed(docs, "doc_id", "text", 2048L, 8))
    graft.Caching.release()
    assert(gated == flat, "gate must not change the result")
    assert(bucketed == flat,
      "bucketed cumsum must be value-identical to the global window")
    // sanity: the map is a real packing — contiguous, budget-chunked
    val sorted = flat.toSeq.sortBy(_._1)
    var cum = 0L
    sorted.foreach { case (_, n, start, bf, bl) =>
      assert(start == cum)
      assert(bf == start / 2048L && bl == (cum + n - 1) / 2048L)
      cum += n
    }
  }
}
