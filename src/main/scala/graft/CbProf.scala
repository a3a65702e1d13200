package graft

import org.apache.spark.sql.functions._

/** corpus_build stage isolator at an arbitrary SF: times each curation
  * stage's standalone noop write and samples executor stacks during the
  * heaviest, so a superlinear corpus_build draw can be pinned to a stage.
  * Usage: runMain graft.CbProf [sfDir]
  */
object CbProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("cb-prof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; val c0 = bean.getProcessCpuTime
      f
      println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2fs wall " +
        f"${(bean.getProcessCpuTime - c0) / 1e9}%.1fs cpu")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    import scala.jdk.CollectionConverters._
    def sample(secs: Int): Thread = {
      val t = new Thread(() => {
        val counts = scala.collection.mutable.Map.empty[String, Int]
        (1 to secs * 10).foreach { _ =>
          Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
            if (th.getName.startsWith("Executor task") && st.nonEmpty) {
              val hot = st.take(3).mkString(" <- ")
              counts(hot) = counts.getOrElse(hot, 0) + 1
            }
          }
          Thread.sleep(100)
        }
        counts.toSeq.sortBy(-_._2).take(10).foreach { case (f, c) =>
          println(s"== HOT[$c] $f") }
      })
      t.setDaemon(true); t.start(); t
    }
    val docs = Tables.load(spark, dir, "documents")
    time("warm scan")(noop(docs.select(length(col("text")))))
    time("fingerprint+keep")(noop(
      graft.extra.TextStats.fingerprint(docs, "doc_id", "text")
        .groupBy("fingerprint").agg(min("doc_id"))))
    time("stats/quality")(noop(
      graft.extra.TextStats.stats(docs, "doc_id", "text")))
    time("langId")(noop(
      graft.extra.TextStats.langId(docs, "doc_id", "text")))
    val s1 = sample(20)
    time("repetitionMetrics")(noop(
      graft.extra.CorpusOps.repetitionMetrics(docs, "doc_id", "text")))
    s1.join(2000)
    time("decontaminate")(noop(
      graft.extra.CorpusOps.decontaminate(docs, "doc_id", "text")))
    time("full corpus_build")(noop(
      graft.extra.CorpusPipeline.build(docs, "doc_id", "text")))
    spark.stop()
  }
}
