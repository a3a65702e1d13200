package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged startup cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    var failed = List.empty[String]
    def timed(name: String)(f: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try f
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name: $e"); failed ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Explicit train step (danae builds its index at startup, not per query):
    // charged honestly as its own line; the queries after it measure search.
    val train = timed("train_index") {
      search.Sketches.train(spark, sfDir)
      search.CombinedScorer.datasetMetadata(spark, sfDir).count()
    }
    // noop sink: forces full materialization of every column (count() would
    // let Catalyst prune per-row work like hashes and scores).
    val results = (train +: SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      timed(name)(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
    }).toMap
    val qs = results.map { case (k, v) =>
      // failed queries get a negative sentinel so the JSON can't read green
      val t = if (failed.contains(k)) -v else v
      s"\"" + k + "\":" + t
    }.mkString("{", ",", "}")
    val errs = failed.map(n => s"\"$n\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
