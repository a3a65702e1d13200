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
}
