package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines ingestion — the de-facto interchange format of LLM training
  * corpora (one document object per line, usually .jsonl or .jsonl.gz).
  * Not part of the danae reference surface (its front door is CSV,
  * ingest/profiling/filters.py) — this is the corpus-side twin of
  * [[CsvIngest]] for the training-data pipeline extras.
  *
  * Scale shape: `spark.read.json` on line-delimited input is a splittable
  * distributed scan (gzip members excepted), and schema is either supplied
  * (zero inference passes) or sampled. Malformed lines are CAPTURED, not
  * dropped or fatal: PERMISSIVE mode routes them to a corrupt-record
  * column, so a 100 TB ingest quantifies its loss instead of dying at hour
  * nine on one bad line.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Distributed permissive read. With `schema` given, no inference pass
    * runs; otherwise Spark samples `samplingRatio` of the input (cap it on
    * huge corpora — inference is a full extra scan at ratio 1.0).
    */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None,
           samplingRatio: Double = 1.0): DataFrame = {
    val base = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    val withSchema = schema match {
      case Some(s) =>
        // the corrupt column must exist in a user schema for capture to work
        val full = if (s.fieldNames.contains(CorruptCol)) s
          else s.add(StructField(CorruptCol, StringType, nullable = true))
        base.schema(full)
      case None => base.option("samplingRatio", samplingRatio)
    }
    val df = withSchema.json(path)
    if (df.schema.fieldNames.contains(CorruptCol)) df
    else df.withColumn(CorruptCol, lit(null).cast(StringType))
  }

  /** Split a permissive read into (clean rows sans corrupt column, corrupt
    * raw lines). The input is pinned first if the caller hasn't already:
    * not an optimization — Spark DISALLOWS queries over raw JSON whose
    * referenced columns are only the internal corrupt-record column
    * (the corrupt side prunes to exactly that), and caching is the
    * documented way to make such a query legal.
    */
  def partitionCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val pinned =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.cache()
      else df
    (pinned.filter(col(CorruptCol).isNull).drop(CorruptCol),
      pinned.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
  }

  /** Ingest-quality report in one pass: row counts, corrupt-line count and
    * per-required-field null counts — the acceptance gate a pipeline checks
    * before promoting a corpus drop. Single wide aggregate, no shuffle.
    */
  def qualityReport(df: DataFrame, requiredFields: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("n_lines") +:
        count(col(CorruptCol)).as("n_corrupt") +:
        requiredFields.map(f =>
          sum(when(col(CorruptCol).isNull && col(f).isNull, 1L).otherwise(0L))
            .as(s"null_$f"))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
