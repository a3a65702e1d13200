package graft.ingest

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The lake catalogue: one descriptor row per dataset, replacing danae's ES
  * index (ingest/publishing/publishing_api.py:8-49) — and the poll-based
  * profiling work queue over it (ingest/profiling/profiler.py:9-41,
  * profiler_tfidf.py:9-68: fetch batch of status=pending, process, mark
  * done/error).
  *
  * Spark-first shape: the catalogue is a parquet table; "publish" appends
  * descriptors with status=pending; the work queue is an INCREMENTAL BATCH
  * job — filter pending, profile those datasets, upsert statuses. No
  * watermarks or session state are needed (SURVEY.md §2.10): the reference's
  * only streaming is this status poll. The same `profilePending` body can be
  * dropped into `foreachBatch` of a streaming source unchanged.
  */
object Catalog {

  /** Descriptor columns (publishing_api.py:8-17, FIXTURES.md §B.1). */
  val descriptorCols: Seq[String] = Seq(
    "dataset_id", "title", "path", "dtype", "description", "keywords",
    "status", "freqs_status", "time_created")

  /** Publish: append descriptors (status=pending) to the catalogue table
    * (S2; replaces the ES POST of publishing_api.py:33-49).
    */
  def publish(descriptors: DataFrame, catalogDir: String): Unit =
    descriptors.write.mode(SaveMode.Append).parquet(catalogDir)

  /** Build pending descriptors for the fixture tables (eodp_publisher.py:21-38
    * builds them from the catalogue CSV; here the lake IS the fixture dir).
    */
  def fixtureDescriptors(spark: SparkSession, lakeDir: String,
                         tables: Seq[String] = Tables.sketchTables): DataFrame = {
    import spark.implicits._
    tables.map { t =>
      val cols = Tables.load(spark, lakeDir, t).columns.mkString(" ")
      (t, t, s"$lakeDir/$t.parquet", "TABULAR", cols, t, "pending", "pending")
    }.toDF("dataset_id", "title", "path", "dtype", "description", "keywords",
        "status", "freqs_status")
      .withColumn("time_created", current_timestamp())
  }

  /** Descriptors from a metadata catalogue CSV — the reference's publisher
    * walks a `;`-separated catalogue and registers one pending descriptor
    * per row (eodp_publisher.py:16-38: title/notes/tags columns; dataset
    * files live beside the catalogue as `<id>.csv.gz`). Columns missing from
    * the catalogue become nulls; dtype is always TABULAR.
    */
  def fromCatalogueCsv(spark: SparkSession, csvPath: String, dataDir: String): DataFrame = {
    val cat = CsvIngest.read(spark, csvPath)
    def colOr(name: String) =
      if (cat.columns.contains(name)) col(name).cast("string") else lit(null).cast("string")
    cat.select(
      colOr("id").as("dataset_id"),
      colOr("title").as("title"),
      concat(lit(s"$dataDir/"), colOr("id"), lit(".csv.gz")).as("path"),
      lit("TABULAR").as("dtype"),
      colOr("notes").as("description"),
      colOr("tags").as("keywords"),
      lit("pending").as("status"),
      lit("pending").as("freqs_status"),
      current_timestamp().as("time_created"))
  }

  /** Status predicate (P2: profiler.py:18-31's `match status: pending`). */
  def pending(spark: SparkSession, catalogDir: String,
              statusCol: String = "status"): DataFrame =
    spark.read.parquet(catalogDir).filter(col(statusCol) === "pending")

  /** One incremental profiling pass (ST1): profile every pending dataset
    * into the sketch table, then flip its status to done (error on failure).
    * Returns the new statuses. At scale this runs on a schedule or inside
    * `foreachBatch`; each pass only touches pending work.
    */
  def profilePending(spark: SparkSession, catalogDir: String, lakeDir: String,
                     sketchDir: String): DataFrame = {
    import spark.implicits._
    val todo = pending(spark, catalogDir).select("dataset_id").as[String].collect().toSeq
    val results = todo.map { id =>
      try {
        val df = Tables.load(spark, lakeDir, id)
        Profiler.quantileSketch(df, id).write.mode(SaveMode.Overwrite)
          .parquet(s"$sketchDir/$id")
        id -> "done"
      } catch { case _: Exception => id -> "error" }
    }
    val statusDf = results.toDF("dataset_id", "new_status")
    val cat = spark.read.parquet(catalogDir)
    val updated = cat.join(broadcast(statusDf), Seq("dataset_id"), "left")
      .withColumn("status", coalesce(col("new_status"), col("status")))
      .drop("new_status")
    // overwrite via staging (parquet has no in-place upsert; Delta would)
    val staged = updated.cache()
    staged.count()
    staged.write.mode(SaveMode.Overwrite).parquet(catalogDir)
    staged.select("dataset_id", "status")
  }

  /** The second work queue (ST2, profiler_tfidf.py:9-68): for every dataset
    * with freqs_status=pending, compute top-10 TF terms per categorical
    * column into the freqs table and flip freqs_status.
    */
  def enrichFreqsPending(spark: SparkSession, catalogDir: String, lakeDir: String,
                         freqsDir: String, k: Int = 10): DataFrame = {
    import spark.implicits._
    val todo = pending(spark, catalogDir, "freqs_status")
      .select("dataset_id").as[String].collect().toSeq
    val results = todo.map { id =>
      try {
        val df = Tables.load(spark, lakeDir, id)
        val cats = Profiler.typedColumns(df, "Categorical")
        val tokens = cats.map { c =>
          TermStats.tokens(df.select(col(c)), c, c)
            .select(lit(c).as("doc_id"), col("term"))
        }.reduceOption(_.unionAll(_))
          .getOrElse(Seq.empty[(String, String)].toDF("doc_id", "term"))
        TermStats.tfTopK(tokens, k)
          .withColumnRenamed("doc_id", "col_name")
          .write.mode(SaveMode.Overwrite).parquet(s"$freqsDir/$id")
        id -> "done"
      } catch { case _: Exception => id -> "error" }
    }
    val statusDf = results.toDF("dataset_id", "new_freqs")
    val cat = spark.read.parquet(catalogDir)
    val updated = cat.join(broadcast(statusDf), Seq("dataset_id"), "left")
      .withColumn("freqs_status", coalesce(col("new_freqs"), col("freqs_status")))
      .drop("new_freqs")
    val staged = updated.cache()
    staged.count()
    staged.write.mode(SaveMode.Overwrite).parquet(catalogDir)
    staged.select("dataset_id", "freqs_status")
  }
}
