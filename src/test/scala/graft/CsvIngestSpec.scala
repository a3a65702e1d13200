package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.ingest.CsvIngest
import org.scalatest.funsuite.AnyFunSuite

/** CSV dialect fixtures per FIXTURES.md §B.7. */
class CsvIngestSpec extends AnyFunSuite {

  private def write(name: String, content: Array[Byte], gzip: Boolean = false): String = {
    val dir = Files.createTempDirectory("csv")
    val p = dir.resolve(name)
    if (gzip) {
      val out = new GZIPOutputStream(Files.newOutputStream(p))
      out.write(content); out.close()
    } else Files.write(p, content)
    p.toString
  }

  test("encoding sniff: UTF-8 vs Latin-1") {
    assert(CsvIngest.sniffEncoding("a;b\nä;ö\n".getBytes(StandardCharsets.UTF_8)) == "UTF-8")
    assert(CsvIngest.sniffEncoding("a;b\nä;x\n".getBytes(StandardCharsets.ISO_8859_1)) == "ISO-8859-1")
  }

  test("separator sniff across ; , tab") {
    assert(CsvIngest.sniffSeparator("a;b;c\n1;2;3\n") == ";")
    assert(CsvIngest.sniffSeparator("a,b,c\n1,2,3\n") == ",")
    assert(CsvIngest.sniffSeparator("a\tb\n1\t2\n") == "\t")
    // decimal-comma fields don't fool it when ; is the consistent dialect
    assert(CsvIngest.sniffSeparator("x;y\n1,5;2,25\n3,1;4,0\n") == ";")
  }

  test("header collection and readability gate (filters.py:35-50)") {
    assert(CsvIngest.collectHeader("lat;long;name\r\n1;2;x", ";") ==
      Seq("lat", "long", "name"))
    assert(CsvIngest.isCsvReadable("a;b;c"))
    assert(!CsvIngest.isCsvReadable("<html><body>"))
    assert(!CsvIngest.isCsvReadable("""{"json": true}"""))
    assert(!CsvIngest.isCsvReadable(""))
  }

  test("gzip end-to-end sniff + distributed read") {
    val path = write("d.csv.gz",
      "lattitude;longitude;v\n1,5;2,5;x\n3,0;4,0;y\n".getBytes(StandardCharsets.UTF_8),
      gzip = true)
    val d = CsvIngest.sniff(path)
    assert(d.encoding == "UTF-8" && d.separator == ";" && d.readable)
    assert(d.header == Seq("lattitude", "longitude", "v"))
    val df = CsvIngest.read(SparkTestSession.spark, path)
    assert(df.columns.toSeq == Seq("lattitude", "longitude", "v"))
    assert(df.count() == 2)
    // the misspelt 'lattitude' maps to Spatial (profiler.py:90-99 quirk)
    assert(graft.ingest.Profiler.danaeType(df.schema("lattitude")) == "Spatial")
  }

  test("CSV → spatial sketch → searchable by knn (5-type end-to-end)") {
    val spark = SparkTestSession.spark
    val p1 = write("geo1.csv",
      "lattitude;longitude;name\n1,0;2,0;a\n3,0;4,0;b\n".getBytes(StandardCharsets.UTF_8))
    val p2 = write("geo2.csv",
      "lat;long;name\n1,5;2,5;c\n2,5;3,5;d\n".getBytes(StandardCharsets.UTF_8))
    val s1 = graft.search.Sketches.forDataFrame(CsvIngest.read(spark, p1), "geo1")
    val s2 = graft.search.Sketches.forDataFrame(CsvIngest.read(spark, p2), "geo2")
    val rows = s1.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("col_type") == "Spatial")
    assert(rows(0).getSeq[Double](rows(0).fieldIndex("vector")) == Seq(2.0, 1.0, 4.0, 3.0))
    val knn = graft.search.DistanceJoin.knn(s1.unionAll(s2), "geo1", 10, 2).collect()
    assert(knn.length == 1)
    assert(knn(0).getAs[String]("c_dataset") == "geo2")
    assert(knn(0).getAs[String]("col_type") == "Spatial")
    assert(knn(0).getAs[Double]("dist") > 0)
  }

  test("temporal inference on string columns (profiler.py:84-88 analogue)") {
    val p = write("dated.csv",
      ("when;what;amount\n2024-01-01 10:00:00;x;1\n2024-02-03 11:30:00;y;2\n")
        .getBytes(StandardCharsets.UTF_8))
    val df = CsvIngest.read(SparkTestSession.spark, p)
    assert(graft.ingest.Profiler.danaeType(df.schema("when")) == "Temporal")
    assert(graft.ingest.Profiler.danaeType(df.schema("what")) == "Categorical")
    assert(graft.ingest.Profiler.danaeType(df.schema("amount")) == "Numeric")
    // and the temporal column sketches as epoch percentiles end-to-end
    val sk = graft.search.Sketches.forDataFrame(df, "dated").collect()
    assert(sk.exists(r => r.getAs[String]("col_name") == "when"
      && r.getAs[String]("col_type") == "Temporal"))
  }

  test("non-CSV file is rejected at read") {
    val path = write("x.csv", "<html><table>".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      CsvIngest.read(SparkTestSession.spark, path)
    }
  }
}
