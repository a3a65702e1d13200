package graft

import org.apache.spark.sql.functions._
import graft.tools.Prof

/** corpus_build stage isolator at an arbitrary SF: times each curation
  * stage's standalone noop write and samples executor stacks during the
  * heaviest, so a superlinear corpus_build draw can be pinned to a stage.
  * Usage: runMain graft.CbProf [sfDir]
  */
object CbProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = Prof.session("cb-prof")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = Tables.load(spark, dir, "documents")
    Prof.time("warm scan")(noop(docs.select(length(col("text")))))
    Prof.time("fingerprint+keep")(noop(
      graft.extra.TextStats.fingerprint(docs, "doc_id", "text")
        .groupBy("fingerprint").agg(min("doc_id"))))
    Prof.time("stats/quality")(noop(
      graft.extra.TextStats.stats(docs, "doc_id", "text")))
    Prof.time("langId")(noop(
      graft.extra.TextStats.langId(docs, "doc_id", "text")))
    val s1 = Prof.sampler(20)
    Prof.time("repetitionMetrics")(noop(
      graft.extra.CorpusOps.repetitionMetrics(docs, "doc_id", "text")))
    s1.join(2000)
    Prof.time("decontaminate")(noop(
      graft.extra.CorpusOps.decontaminate(docs, "doc_id", "text")))
    Prof.time("full corpus_build")(noop(
      graft.extra.CorpusPipeline.build(docs, "doc_id", "text")))
    spark.stop()
  }
}
