package graft

import graft.search.CombinedScorer
import graft.streaming.SearchStream
import org.scalatest.funsuite.AnyFunSuite

class SearchStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming search serves batch-identical answers per request") {
    import spark.implicits._
    val sf = SparkTestSession.sf0001
    // request log lands in two file drops -> two micro-batches; customer is
    // requested in both (the serving path must answer repeats, not dedup
    // them across batches)
    val dir = java.nio.file.Files.createTempDirectory("search_req").toString
    Seq("customer").toDF("query_id").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq("orders", "customer").toDF("query_id").coalesce(1)
      .write.mode("append").parquet(dir)

    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    val requests = spark.readStream
      .schema("query_id STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = SearchStream.serve(spark, sf, requests) { (answers, _) =>
      val rows = answers
        .select("query_id", "c_dataset", "overall_score").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      buf.synchronized { buf ++= rows }
    }
    try q.processAllAvailable() finally q.stop()

    def batchOf(id: String) = CombinedScorer.search(spark, sf, id)
      .select("query_id", "c_dataset", "overall_score").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq.sorted
    val customer = batchOf("customer")
    val orders = batchOf("orders")
    assert(customer.nonEmpty && orders.nonEmpty)
    // customer answered once per requesting batch (file drops may coalesce
    // into fewer micro-batches, so once OR twice — but always identically)
    val gotCustomer = buf.filter(_._1 == "customer").sorted
    assert(gotCustomer == customer || gotCustomer == (customer ++ customer).sorted,
      s"got ${gotCustomer.size} customer rows")
    assert(buf.filter(_._1 == "orders").sorted == orders)
  }

  test("duplicate in-flight requests each get a correlated answer block") {
    import spark.implicits._
    val sf = SparkTestSession.sf0001
    // two IDENTICAL requests for customer in ONE micro-batch, distinct only
    // by request_id — both must be answered and correlated
    val dir = java.nio.file.Files.createTempDirectory("search_req_id").toString
    Seq(("r1", "customer"), ("r2", "customer"), ("r3", "orders"))
      .toDF("request_id", "query_id").coalesce(1)
      .write.mode("append").parquet(dir)

    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val requests = spark.readStream
      .schema("request_id STRING, query_id STRING").parquet(dir)
    val q = SearchStream.serve(spark, sf, requests) { (answers, _) =>
      val rows = answers
        .select("request_id", "query_id", "c_dataset").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      buf.synchronized { buf ++= rows }
    }
    try q.processAllAvailable() finally q.stop()

    val customer = CombinedScorer.search(spark, sf, "customer")
      .select("c_dataset").collect().map(_.getString(0)).toSeq.sorted
    assert(customer.nonEmpty)
    // each duplicate request carries the SAME block, stamped with ITS id
    assert(buf.filter(_._1 == "r1").map(_._3).sorted == customer)
    assert(buf.filter(_._1 == "r2").map(_._3).sorted == customer)
    assert(buf.filter(_._1 == "r3").nonEmpty)
    assert(buf.forall(r => r._2 == (if (r._1 == "r3") "orders" else "customer")))
  }

  test("an unknown query_id is reported, not fatal; the rest still answer") {
    import spark.implicits._
    val sf = SparkTestSession.sf0001
    val dir = java.nio.file.Files.createTempDirectory("search_bad").toString
    Seq("no_such_dataset", "customer").toDF("query_id").coalesce(1)
      .write.mode("append").parquet(dir)

    val answered = scala.collection.mutable.Set.empty[String]
    val failed = scala.collection.mutable.Set.empty[String]
    val requests = spark.readStream.schema("query_id STRING").parquet(dir)
    val q = SearchStream.serve(spark, sf, requests,
      badRequest = (id, _) => failed.synchronized { failed += id }) { (df, _) =>
      val got = df.select("query_id").distinct().collect().map(_.getString(0))
      answered.synchronized { answered ++= got }
    }
    try q.processAllAvailable() finally q.stop()
    assert(failed.toSet == Set("no_such_dataset"))
    assert(answered.toSet == Set("customer"))
  }
}
