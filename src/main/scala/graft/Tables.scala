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
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // parquet timestamp[us] with isAdjustedToUTC=false surfaces as NTZ
        // under Spark's default inferTimestampNTZ; watermarks and epoch
        // functions require TIMESTAMP. Session tz is UTC everywhere, so the
        // cast is value-identical to what DuckDB reads.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Tables used for the column-sketch pipeline (star schema + events). */
  val sketchTables: Seq[String] = star :+ "events"
}
