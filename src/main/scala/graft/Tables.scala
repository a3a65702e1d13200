package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader. The data lake "datasets" are the driver's parquet
  * tables (TESTDATA.md); each table plays the role of one danae dataset
  * descriptor (reference: ingest/publishing/eodp_publisher.py:16-38).
  */
object Tables {
  /** Star-schema tables that act as profiled "datasets" in the lake. */
  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  val all: Seq[String] = star ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet timestamp[ns]; depending on the session config
    // Spark either refuses it or surfaces it as a nanosecond long. Normalize
    // to TimestampType (microseconds, truncated like DuckDB does) so the
    // schema-driven type mapping and the oracle agree.
    if (name == "events")
      try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Exception => () } // read-only conf in some harnesses
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Tables used for the column-sketch pipeline (star schema + events). */
  val sketchTables: Seq[String] = star :+ "events"
}
