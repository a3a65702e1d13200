package graft.ingest

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV dialect sniffing + ingestion — danae's profiling front door
  * (reference: ingest/profiling/filters.py:12-57: chardet over the first 50
  * raw lines, pandas dialect sniff on 10 rows, header collection, HTML/JSON
  * rejection; ingest/profiling/profiler.py:56-86 wires them before read).
  *
  * Sniffing is deliberately driver-side imperative code over the file HEAD
  * only (SURVEY.md §7.4) — it reads a few KB no matter how large the file
  * is; the actual data read is a distributed `spark.read.csv` with the
  * sniffed dialect as options, so Spark's splittable CSV reader does the
  * heavy lifting.
  */
object CsvIngest {

  val SniffBytes = 64 * 1024
  val SeparatorCandidates: Seq[Char] = Seq(';', ',', '\t', '|')

  /** Read the head of a (possibly gzipped) file. */
  def headBytes(path: String): Array[Byte] = {
    val fs = new java.io.FileInputStream(path)
    try {
      val in = if (path.endsWith(".gz")) new GZIPInputStream(fs) else fs
      val buf = new Array[Byte](SniffBytes)
      var off = 0
      var read = 0
      while (off < buf.length && { read = in.read(buf, off, buf.length - off); read > 0 })
        off += read
      buf.take(off)
    } finally fs.close()
  }

  /** Encoding sniff (filters.py:12-24 uses chardet; here: strict UTF-8
    * decode attempt, fall back to ISO-8859-1 which accepts any byte).
    */
  def sniffEncoding(head: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(head)); "UTF-8" }
    catch { case _: Exception => "ISO-8859-1" }
  }

  /** Separator sniff (filters.py:26-33): over the first 10 lines, pick the
    * candidate with a consistent, maximal per-line count.
    */
  def sniffSeparator(head: String): String = {
    val lines = head.split("\r?\n").take(10).filter(_.nonEmpty)
    if (lines.isEmpty) return ","
    val best = SeparatorCandidates.map { sep =>
      val counts = lines.map(_.count(_ == sep))
      val consistent = counts.nonEmpty && counts.distinct.length == 1 && counts.head > 0
      (sep, if (consistent) counts.head else 0)
    }.maxBy(_._2)
    if (best._2 == 0) "," else best._1.toString
  }

  /** First row, CR/LF-stripped (filters.py:35-42 joins it with ';'). */
  def collectHeader(head: String, sep: String): Seq[String] =
    head.split("\r?\n").headOption.toSeq
      .flatMap(_.split(java.util.regex.Pattern.quote(sep), -1).toSeq)
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))

  /** Reject HTML/JSON masquerading as CSV (filters.py:44-50). */
  def isCsvReadable(header: String): Boolean = {
    val h = header.trim
    h.nonEmpty && !h.startsWith("<") && !h.startsWith("{") && !h.startsWith("[")
  }

  case class Dialect(encoding: String, separator: String, header: Seq[String],
                     readable: Boolean)

  def sniff(path: String): Dialect = {
    val bytes = headBytes(path)
    val enc = sniffEncoding(bytes)
    val text = new String(bytes, Charset.forName(enc))
    val sep = sniffSeparator(text)
    val hdr = collectHeader(text, sep)
    Dialect(enc, sep, hdr, isCsvReadable(text.linesIterator.nextOption().getOrElse("")))
  }

  /** Distributed CSV read with the sniffed dialect (profiler.py:79-86's
    * pandas read becomes a splittable Spark scan; schema inference on),
    * followed by temporal inference on leftover string columns.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val d = sniff(path)
    require(d.readable, s"$path rejected: not CSV (filters.py:44-50 semantics)")
    val df = spark.read
      .option("header", "true")
      .option("sep", d.separator)
      .option("encoding", d.encoding)
      .option("inferSchema", "true")
      .csv(path)
    inferTemporal(df)
  }

  /** Temporal inference for string columns (profiler.py:84-88 probes each
    * object column with pd.to_datetime): a column whose non-null values all
    * parse as timestamps (and that has any values at all) is cast. One
    * aggregation pass probes every string column together; only columns
    * Spark's CSV inference left as plain strings are considered.
    */
  def inferTemporal(df: DataFrame, minRatio: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StringType
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    if (strCols.isEmpty) return df
    val probes = strCols.flatMap { c =>
      Seq(count(col(c)).as(s"n__$c"),
        count(try_to_timestamp(col(c))).as(s"ts__$c"))
    }
    val row = df.agg(probes.head, probes.tail: _*).collect()(0)
    val temporal = strCols.filter { c =>
      val n = row.getAs[Long](s"n__$c")
      n > 0 && row.getAs[Long](s"ts__$c") >= n * minRatio
    }
    temporal.foldLeft(df)((acc, c) => acc.withColumn(c, to_timestamp(col(c))))
  }
}
