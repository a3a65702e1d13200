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
    * per-(lang, source) quality percentile. One left-join flag frame per
    * gate, ONE corpus-pass aggregate computing every cumulative survivor
    * sum at once, then a 6-row `stack` unpivot.
    *
    * The source table is scanned ONCE even standalone: the gates are fed a
    * pinned (doc_id, text, lang, source) projection
    * ([[graft.Caching.temp]], the [[CorpusOps.corpusMixTemperature]]
    * pattern), so the 5 gate subplans — several of which are themselves
    * multi-pass — read the in-memory columnar pin instead of each
    * rescanning the corpus (~6 source scans before). At 100 TB the pin
    * spills columnar to local disk; every gate pass is still cluster-local
    * I/O, not a repeated remote-store scan.
    *
    * @return (stage_id, stage, docs, tokens, pct_docs) — 6 rows
    */
  def curationFunnel(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", maxDupRatio: Double = 0.8,
                     minPctGroup: Double = 0.1): DataFrame = {
    val pinned = graft.Caching.temp(docs.select(
      col(idCol).as("doc_id"), col(textCol).as("text"),
      col("lang"), col("source")))
    val base = pinned.select(col("doc_id"),
      size(filter(split(lower(col("text")), " "), t => t =!= ""))
        .cast("long").as("toks"))
    val canon = TextStats.fingerprint(pinned, "doc_id", "text")
      .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(1).as("g1"))
    val gopher = Signals.gopherRules(pinned, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("g2"))
    val rep = CorpusOps.repetitionMetrics(pinned, "doc_id", "text")
      .select(col("doc_id"),
        (col("dup_word_ratio") <= maxDupRatio).cast("int").as("g3"))
    val decon = CorpusOps.decontaminate(pinned, "doc_id", "text")
      .select(col("doc_id"), (col("contaminated") === 0).cast("int").as("g4"))
    val qn = CorpusOps.qualityNorm(pinned, "doc_id", "text")
      .select(col("doc_id"),
        (col("pct_group") >= minPctGroup).cast("int").as("g5"))
    val gates = Seq("g1", "g2", "g3", "g4", "g5")
    val flags = Seq(canon, gopher, rep, decon, qn)
      .foldLeft(base)((acc, g) => acc.join(g, Seq("doc_id"), "left"))
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
