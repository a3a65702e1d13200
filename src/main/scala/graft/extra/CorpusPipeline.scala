package graft.extra

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus selection — the operators composed the way a
  * data-curation pipeline actually runs them: normalize-fingerprint dedup
  * (keep the smallest doc id per fingerprint), quality gate, language gate.
  * Everything is one declarative plan: the dedup is a groupBy on the
  * fingerprint, the gates are per-row codegen'd predicates, and Catalyst
  * fuses the whole thing into scan → project → (tiny) shuffle → semi-join.
  */
object CorpusPipeline {

  def select(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             langs: Seq[String] = Seq("en")): DataFrame = {
    val fp = TextStats.fingerprint(docs, idCol, textCol)
    val keep = fp.groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
    val quality = TextStats.stats(docs, idCol, textCol)
      .select(col("doc_id"), col("quality"))
    val lang = TextStats.langId(docs, idCol, textCol)
      .select(col("doc_id"), col("lang_pred"))
    keep
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .filter(col("quality") >= minQuality && col("lang_pred").isin(langs: _*))
      .select("doc_id", "fingerprint", "quality", "lang_pred")
  }

  /** Full corpus assembly — every curation stage composed as ONE declarative
    * plan, the way a training-data drop is actually cut:
    * [[select]] (fingerprint dedup + quality + language gates) →
    * repetition gate ([[CorpusOps.repetitionMetrics]]) → benchmark
    * decontamination ([[CorpusOps.decontaminate]]; held-out docs are also
    * excluded from the output, as an eval set must be) → per-(language,
    * source) quality-quota mix. Every stage is doc_id-keyed joins/aggs plus
    * one quota window — no cross-document shuffle anywhere except the
    * fingerprint groupBy, so the whole build is linear in the corpus.
    *
    * @return (doc_id, lang_pred, source, quality, rk)
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.3, langs: Seq[String] = Seq("en"),
            maxDupRatio: Double = 0.8, quota: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val selected = select(docs, idCol, textCol, minQuality, langs)
    val rep = CorpusOps.repetitionMetrics(docs, idCol, textCol)
      .select(col("doc_id"), col("dup_word_ratio"))
    val decon = CorpusOps.decontaminate(docs, idCol, textCol)
      .select(col("doc_id"), col("contaminated"))
    selected
      .join(rep, "doc_id")
      .join(decon, "doc_id")
      .filter(col("dup_word_ratio") <= maxDupRatio && col("contaminated") === 0)
      .join(docs.select(col(idCol).as("doc_id"), col("source")), "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang_pred", "source")
          .orderBy(col("quality").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= quota)
      .select("doc_id", "lang_pred", "source", "quality", "rk")
  }

  /** The MODERN curation cut — [[build]]'s C4/Gopher-era gates swapped for
    * the 2023 recipe, composed as one declarative plan: exact fingerprint
    * dedup → per-(lang, source) quality PERCENTILE gate
    * ([[CorpusOps.qualityNorm]], CCNet-style: every source sheds its own
    * worst tail, so a clean source is never starved by a global threshold)
    * → embedding-space semantic dedup ([[EmbeddingKnn.semanticDedup]]'s
    * keep verdict joined on the document's vector id) → leakage-safe
    * group-keyed split ([[CorpusOps.splitAssignBy]]). Everything after the
    * fingerprint groupBy and the cell-bounded semantic pass is doc_id-keyed
    * joins and per-row predicates — linear in the corpus, and each stage's
    * scale story is its own operator's.
    *
    * @return (doc_id, lang, source, quality, pct_group, split)
    */
  def build2(docs: DataFrame, emb: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", minPctGroup: Double = 0.1): DataFrame = {
    val keep = TextStats.fingerprint(docs, idCol, textCol)
      .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
    val norm = CorpusOps.qualityNorm(docs, idCol, textCol)
    val sem = EmbeddingKnn.semanticDedup(emb)
      .filter(col("keep") === 1).select(col("vec_id").as("doc_id"))
    val split = CorpusOps.splitAssignBy(docs, idCol, "source")
      .select("doc_id", "split")
    keep.select("doc_id")
      .join(norm, "doc_id")
      .filter(col("pct_group") >= minPctGroup)
      .join(sem, "doc_id")
      .join(split, "doc_id")
      .select("doc_id", "lang", "source", "quality", "pct_group", "split")
  }

  /** Per-stage curation attrition report — the telemetry a production
    * curation run publishes beside its output: how many documents (and
    * whitespace tokens) survive each successive gate, cumulatively, in
    * pipeline order: raw → exact fingerprint dedup → Gopher rule set
    * ([[Signals.gopherRules]]) → repetition gate → benchmark
    * decontamination (held-out docs count as dropped, as in [[build]]) →
    * per-(lang, source) quality percentile. ONE corpus-pass aggregate
    * computes every cumulative survivor sum at once, then a 6-row `stack`
    * unpivot.
    *
    * Scan economy (A/B-measured, PLANS.md round-10): every PER-ROW gate —
    * token count, fingerprint, the full Gopher conjunction, and the
    * intra-document dup-word ratio — rides one shared projection on one
    * corpus scan, and the exact-dedup verdict is a min-over-fingerprint
    * window on that same frame (no groupBy + join-back). The repetition
    * gate deliberately does NOT call [[CorpusOps.repetitionMetrics]]: the
    * funnel consumes only `dup_word_ratio`, which is per-row, and the full
    * operator's topGram subplans would add two gram explode+shuffles whose
    * output is discarded here. Only the two genuinely aggregate gates
    * (decontamination's benchmark gram join, the quality percentile grid)
    * branch with their own columnar-pruned scans. Pinning the raw text
    * projection and feeding every branch from cache was measured 35%
    * SLOWER (2.77s vs 3.87s at sf0.1, interleaved min-of-2): the
    * InMemoryTableScan of wide strings pays materialization and breaks
    * scan→consumer codegen fusion. At 100 TB on a remote object store,
    * where a rescan is remote I/O instead of page-cached local parquet,
    * swap `docs` for a disk-persisted narrow projection at the two branch
    * sites — the plan shape is unchanged.
    *
    * @return (stage_id, stage, docs, tokens, pct_docs) — 6 rows
    */
  def curationFunnel(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", maxDupRatio: Double = 0.8,
                     minPctGroup: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksArr = graft.functions.TextTokens.lowerSpaceTokens(col(textCol))
    // dup_word_ratio exactly as CorpusOps.repetitionMetrics computes it
    val dwr = when(size(toksArr) > 0,
      round(lit(1.0) -
        size(array_distinct(toksArr)).cast("long").cast("double") /
          size(toksArr).cast("long"), 6))
      .otherwise(0.0)
    val per = Signals.gopherRules(
      docs.select(col(idCol).as("doc_id"), col(textCol).as(textCol))
        .withColumn("toks", size(toksArr).cast("long"))
        .withColumn("fingerprint", TextStats.fingerprintCol(col(textCol)))
        .withColumn("g3", (dwr <= maxDupRatio).cast("int")),
      "doc_id", textCol,
      passthrough = Seq("toks", "fingerprint", "g3"))
    val flags0 = per.select(col("doc_id"), col("toks"), col("fingerprint"),
        col("keep").as("g2"), col("g3"))
      .withColumn("g1", (col("doc_id") ===
        min("doc_id").over(Window.partitionBy("fingerprint"))).cast("int"))
    val decon = CorpusOps.decontaminate(docs, idCol, textCol)
      .select(col("doc_id"), (col("contaminated") === 0).cast("int").as("g4"))
    val qn = CorpusOps.qualityNorm(docs, idCol, textCol)
      .select(col("doc_id"),
        (col("pct_group") >= minPctGroup).cast("int").as("g5"))
    val gates = Seq("g1", "g2", "g3", "g4", "g5")
    val flags = Seq(decon, qn)
      .foldLeft(flags0: DataFrame)((acc, g) => acc.join(g, Seq("doc_id"), "left"))
      .na.fill(0, gates)
    // cumulative conjunctions: stage k keeps docs passing gates 1..k
    val cum = gates.scanLeft(lit(true))((acc, g) => acc && (col(g) === 1))
    val aggCols = cum.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(when(c, 1L).otherwise(0L)).as(s"d$i"),
        sum(when(c, col("toks")).otherwise(0L)).as(s"t$i"))
    }
    val one = flags.agg(aggCols.head, aggCols.tail: _*)
    val names = Seq("raw", "exact_dedup", "gopher", "repetition",
      "decontamination", "quality_pct")
    val stackExpr = names.zipWithIndex
      .map { case (n, i) => s"$i, '$n', d$i, t$i" }
      .mkString(s"stack(${names.size}, ", ", ",
        ") as (stage_id, stage, docs, tokens)")
    one.select(expr(stackExpr), col("d0"))
      .withColumn("pct_docs",
        round(col("docs").cast("double") / col("d0"), 6))
      .drop("d0")
      .orderBy("stage_id")
  }
}
