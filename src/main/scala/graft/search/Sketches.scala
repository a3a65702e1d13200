package graft.search

import graft.Tables
import graft.ingest.{Embedder, Profiler, TermStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the central column-sketch table — the Spark replacement for both
  * danae's ES profile documents and its four R-tree indexes
  * (search/content_search.py:29-34,129-184; search/index.py:6-43).
  *
  * Schema: (dataset_id, col_name, col_type, vector array<double>).
  *  - Numeric / Temporal: 7-dim percentile vector [min,5%,25%,50%,75%,95%,max]
  *  - Categorical: mean-pooled embedding of the column's top-10 TF terms
  *    (word_aggregator.py:13-24), embeddings drawn from the fixture
  *    `embeddings` table via a deterministic term hash.
  *
  * The sketch table IS the index: one parquet scan replaces danae's ES
  * scroll + per-id fetch "train" step (content_search.py:215-253). At scale
  * it is tiny relative to the lake (rows = #datasets × #columns), so search
  * joins against it broadcast.
  */
object Sketches {

  /** Numeric + temporal percentile sketches for the fixture tables. */
  def numericTemporal(spark: SparkSession, dir: String,
                      tables: Seq[String] = Tables.sketchTables): DataFrame =
    tables.map { t =>
      Profiler.quantileSketch(Tables.load(spark, dir, t), t)
    }.reduce(_.unionAll(_))

  /** Categorical sketches: per string column, top-10 TF terms of the cell
    * values, mapped to embedding vectors and mean-pooled (profiler.py:113-122
    * column concat → filters.py:137-158 top terms → word_aggregator pooling).
    */
  def categorical(spark: SparkSession, dir: String,
                  tables: Seq[String] = Tables.sketchTables,
                  dim: Int = 64): DataFrame = {
    val embeddings = Tables.load(spark, dir, "embeddings")
    val tokens = tables.map { t =>
      val df = Tables.load(spark, dir, t)
      Profiler.typedColumns(df, "Categorical").map { c =>
        TermStats.tokens(df.select(col(c)), c, c)
          .select(concat_ws("/", lit(t), lit(c)).as("doc_id"), col("term"))
      }.reduceOption(_.unionAll(_))
    }.flatten.reduce(_.unionAll(_))
    val topTerms = TermStats.tfTopK(tokens, 10)
    val withVecs = Embedder.termVectors(topTerms, embeddings, "term")
      .withColumn("vec", transform(col("embedding"), _.cast("double")))
    Embedder.meanPoolVec(withVecs, "doc_id", "vec", dim)
      .select(
        split(col("doc_id"), "/").getItem(0).as("dataset_id"),
        split(col("doc_id"), "/").getItem(1).as("col_name"),
        lit("Categorical").as("col_type"),
        col("mean_vec").as("vector"))
  }

  /** Full sketch table across column types. */
  def all(spark: SparkSession, dir: String): DataFrame =
    numericTemporal(spark, dir).unionAll(categorical(spark, dir))
}
