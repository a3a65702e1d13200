package graft.tools

import graft.Tables
import graft.ingest.Profiler
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the histogram-quantile interpolation's pre-explode
  * pruning (round 18): the library path (prefilter → explode ×|ps|) vs an
  * inline copy of the former shape (explode the whole distinct-value
  * histogram ×|ps|, then filter). Both produce identical rows (the
  * prefilter is a superset interval test; asserted per rep).
  * Usage: runMain graft.tools.QhProbe [sfDir] [reps]
  */
object QhProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Prof.session("qhprobe")
    val loaded = Tables.sketchTables.map(t => t -> Tables.load(spark, dir, t))
    val colIds = {
      var next = -1
      loaded.map { case (t, df) =>
        (t, Profiler.sketchCols(df).map { case (c, ty) =>
          next += 1; (c, ty, next) })
      }
    }
    def stream = loaded.zip(colIds).map { case ((_, df), (_, cols)) =>
      Profiler.valueStreamById(Profiler.spreadSketchCols(df), cols)
    }.reduce(_.unionAll(_))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // inline copy of the pre-round-18 shape: explode ×|ps| THEN filter
    def oldShape(): org.apache.spark.sql.DataFrame = {
      val ps = Profiler.sketchPs
      val hist = stream.groupBy(col("cid"), col("v"))
        .agg(count(lit(1)).as("cnt"))
      val totals = hist.groupBy(col("cid")).agg(sum("cnt").as("n"))
      val byCol = org.apache.spark.sql.expressions.Window
        .partitionBy("cid").orderBy("v")
      val withCum = hist.withColumn("cum", sum("cnt").over(byCol.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .join(broadcast(totals), Seq("cid"))
      val pExpr = ps.zipWithIndex.map { case (p, i) =>
        s"struct(${i + 1}L as dim, ${math.round(p * 1e6)}L as pm)" }
      withCum
        .select(col("*"), expr(s"explode(array(${pExpr.mkString(",")})) as pp"))
        .select(col("cid"), col("v"), col("cnt"), col("cum"), col("n"),
          col("pp.dim").as("dim"), col("pp.pm").as("pm"))
        .withColumn("posm", col("pm") * (col("n") - 1))
        .withColumn("lo", expr("posm DIV 1000000"))
        .withColumn("hi", col("lo") +
          when(expr("posm % 1000000") > 0, 1L).otherwise(0L))
        .filter((col("cum") - col("cnt") <= col("lo") && col("lo") <= col("cum") - 1)
          || (col("cum") - col("cnt") <= col("hi") && col("hi") <= col("cum") - 1))
        .groupBy(col("cid"), col("dim"))
        .agg(
          max(when(col("cum") - col("cnt") <= col("lo") && col("lo") <= col("cum") - 1,
            col("v"))).as("v_lo"),
          max(when(col("cum") - col("cnt") <= col("hi") && col("hi") <= col("cum") - 1,
            col("v"))).as("v_hi"),
          first(expr("posm % 1000000")).as("fm"))
        .withColumn("num",
          round(col("v_lo") * lit(1e6)).cast("decimal(38,0)") * (lit(1000000L) - col("fm"))
            + round(col("v_hi") * lit(1e6)).cast("decimal(38,0)") * col("fm"))
        .withColumn("outm", expr("(num - (num % 1000000)) div 1000000")
          + when(expr("num % 1000000") >= 500000, 1L)
            .when(expr("num % 1000000") <= -500000, -1L).otherwise(0L))
        .select(col("cid"), col("dim"),
          (col("outm").cast("double") / lit(1000000.0)).as("v"))
    }
    def newShape(): org.apache.spark.sql.DataFrame =
      Profiler.histogramQuantilesById(stream)
    // equality check once (rows are grid-sized)
    val a = oldShape().collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val b = newShape().collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    require(a == b, s"old/new quantiles diverge: ${a.diff(b)} vs ${b.diff(a)}")
    println(s"== equality holds over ${a.size} quantile rows")
    for (rep <- 1 to reps) {
      Prof.time(s"old explode-first rep=$rep")(noop(oldShape()))
      Prof.time(s"new prefilter rep=$rep")(noop(newShape()))
    }
    println("===== old explode-first plan =====")
    oldShape().explain("formatted")
    println("===== new prefilter plan =====")
    newShape().explain("formatted")
    spark.stop()
  }
}
