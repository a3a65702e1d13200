package graft

import graft.ingest.JsonlIngest
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonlIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id": 1, "text": "hello world", "lang": "en"}""")
    w.println("""{"doc_id": 2, "text": "bonjour", "lang": "fr"}""")
    w.println("""{"doc_id": 3, "text": null, "lang": "en"}""")
    w.println("""{"doc_id": 4 "text": "broken line missing comma"}""")
    w.println("""not json at all""")
    w.close()
    f.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType)))

  test("permissive read captures corrupt lines instead of dying") {
    val df = JsonlIngest.read(spark, writeFixture(), Some(schema)).cache()
    val (clean, corrupt) = JsonlIngest.partitionCorrupt(df)
    assert(clean.count() == 3)
    assert(!clean.columns.contains(JsonlIngest.CorruptCol))
    val bad = corrupt.collect().map(_.getString(0)).toSet
    assert(bad.size == 2)
    assert(bad.exists(_.contains("broken line")))
    assert(bad.contains("not json at all"))
  }

  test("schema-less read infers fields and still captures corrupt lines") {
    val df = JsonlIngest.read(spark, writeFixture()).cache()
    assert(Set("doc_id", "text", "lang").subsetOf(df.columns.toSet))
    val (clean, corrupt) = JsonlIngest.partitionCorrupt(df)
    assert(clean.count() == 3 && corrupt.count() == 2)
  }

  test("quality report: one-pass counts of lines, corruption, and nulls") {
    val df = JsonlIngest.read(spark, writeFixture(), Some(schema))
    val r = JsonlIngest.qualityReport(df, Seq("text", "lang")).collect()(0)
    assert(r.getAs[Long]("n_lines") == 5)
    assert(r.getAs[Long]("n_corrupt") == 2)
    assert(r.getAs[Long]("null_text") == 1)
    assert(r.getAs[Long]("null_lang") == 0)
  }
}
