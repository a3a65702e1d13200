package graft

import graft.ingest.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("size-targeted write: file count tracks the estimate, data survives") {
    val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val est = Compaction.estimatedBytes(li)
    val n = Compaction.write(li, dir, targetFileBytes = est / 4)
    assert(n >= 3 && n <= 6, s"expected ~4 files for a quarter-size target, got $n")
    val files = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(files == n)
    assert(spark.read.parquet(dir).count() == li.count())
  }

  test("range-partitioned sorted write: files own disjoint sorted key ranges") {
    val li = Tables.load(spark, SparkTestSession.sf0001, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("compact_sorted").toString
    val est = Compaction.estimatedBytes(li)
    Compaction.write(li, dir, targetFileBytes = est / 3, sortCols = Seq("l_orderkey"))
    // per file: sorted within; across files: ranges must not interleave
    val perFile = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val keys = spark.read.parquet(f.getAbsolutePath)
          .select("l_orderkey").collect().map(_.getLong(0))
        assert(keys.sameElements(keys.sorted), s"${f.getName} not sorted")
        (keys.min, keys.max)
      }.sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, "file key ranges interleave")
      case _ =>
    }
  }
}
