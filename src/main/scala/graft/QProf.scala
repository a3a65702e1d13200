package graft

import org.apache.spark.sql.functions._

/** Minimal stage-cost isolator: times a raw documents scan, the
  * fingerprint projection, and its noop write at a given SF dir.
  * Usage: runMain graft.QProf [sfDir]
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("qprof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; val c0 = bean.getProcessCpuTime; val g0 = gcMs
      val r = f
      println(f"== $label: ${(System.nanoTime - t0) / 1e9}%.2fs wall " +
        f"${(bean.getProcessCpuTime - c0) / 1e9}%.1fs cpu " +
        f"${(gcMs - g0) / 1e3}%.1fs gc ($r)")
    }
    val docs = Tables.load(spark, dir, "documents")
    time("count")(docs.count())
    time("count (2nd)")(docs.count())
    time("scan text len sum")(
      docs.select(sum(length(col("text")))).collect().head.getLong(0))
    val fp = graft.extra.TextStats.fingerprint(docs, "doc_id", "text")
    time("fingerprint count")(fp.count())
    time("fingerprint noop")(
      fp.write.mode("overwrite").format("noop").save())
    time("fingerprint noop (2nd)")(
      fp.write.mode("overwrite").format("noop").save())
    val justMd5 = docs.select(col("doc_id"), md5(col("text")).as("h"))
    time("plain md5 noop")(
      justMd5.write.mode("overwrite").format("noop").save())
    val justRe = docs.select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("t"))
    // sample executor stacks mid-query to see where the cpu goes
    val sampler = new Thread(() => {
      Thread.sleep(6000)
      val counts = scala.collection.mutable.Map.empty[String, Int]
      (1 to 40).foreach { _ =>
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task") && st.nonEmpty) {
            val hot = st.take(3).mkString(" <- ")
            counts(hot) = counts.getOrElse(hot, 0) + 1
          }
        }
        Thread.sleep(100)
      }
      counts.toSeq.sortBy(-_._2).take(8).foreach { case (f, c) =>
        println(s"== HOT[$c] $f") }
    })
    sampler.setDaemon(true); sampler.start()
    time("one regexp noop")(
      justRe.write.mode("overwrite").format("noop").save())
    sampler.join(8000)
    // marginal cost probes: same engine path, fewer rows / relaid files
    val re50k = docs.limit(50000).select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("t"))
    time("regexp noop limit50k")(
      re50k.write.mode("overwrite").format("noop").save())
    docs.repartition(32).write.mode("overwrite")
      .parquet("/tmp/qprof_relaid")
    val relaid = spark.read.parquet("/tmp/qprof_relaid")
    val reRelaid = relaid.select(col("doc_id"),
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("t"))
    time("regexp noop relaid-32")(
      reRelaid.write.mode("overwrite").format("noop").save())
    time("regexp noop relaid-32 (2nd)")(
      reRelaid.write.mode("overwrite").format("noop").save())
    // pure-JVM control: same pattern, same strings, single thread
    val texts = docs.select("text").limit(50000).collect().map(_.getString(0))
    val p = java.util.regex.Pattern.compile("[^a-z0-9 ]")
    time("pure-jvm regex x50k")(
      texts.map(t => p.matcher(t.toLowerCase).replaceAll("")).length)
    // how many chars does the class actually strip?
    val stripped = texts.take(1000).map(t =>
      t.length - p.matcher(t.toLowerCase).replaceAll("").length)
    println(s"== stripped chars/row (1k sample): mean ${stripped.sum / 1000.0}")
    // N-thread pure-JVM control: same work per thread as the 50k batch,
    // each thread with its OWN compiled pattern (like per-task caching)
    for (n <- Seq(1, 2, 4, 8, 16, 32)) {
      time(s"pure-jvm regex x50k x$n threads") {
        val ts = (1 to n).map { _ =>
          new Thread(() => {
            val tp = java.util.regex.Pattern.compile("[^a-z0-9 ]")
            texts.foreach(t => tp.matcher(t.toLowerCase).replaceAll(""))
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join()); n * texts.length
      }
    }
    // allocation-only control: is ALLOCATION what the box serializes?
    time("pure-jvm alloc-only x50k x32 threads") {
      val ts = (1 to 32).map { _ =>
        new Thread(() => {
          var acc = 0
          texts.foreach { t =>
            val sb = new java.lang.StringBuilder(t.length)
            var i = 0
            while (i < t.length) { sb.append(t.charAt(i)); i += 1 }
            acc += sb.toString.length
          }
          if (acc == 42) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join()); 32 * texts.length
    }
    // regex WITHOUT result allocation: Matcher.find loop, no replaceAll
    time("pure-jvm regex-find-only x50k x32 threads") {
      val ts = (1 to 32).map { _ =>
        new Thread(() => {
          val tp = java.util.regex.Pattern.compile("[^a-z0-9 ]")
          var acc = 0
          texts.foreach { t =>
            val m = tp.matcher(t); while (m.find()) acc += 1 }
          if (acc == -1) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join()); 32 * texts.length
    }
    // dense-compute control at 32 threads (md5-like arithmetic): does the
    // box inflate ALL parallel work or only branchy pointer-chasing?
    time("pure-jvm sum-chars x50k x32 threads") {
      val ts = (1 to 32).map { _ =>
        new Thread(() => {
          var acc = 0L
          texts.foreach { t =>
            var i = 0; while (i < t.length) { acc += t.charAt(i); i += 1 } }
          if (acc == 42) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join()); 32 * texts.length
    }
    spark.stop()
  }
}
