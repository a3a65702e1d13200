package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for Profiler's second-moment strategies (VERDICT r13 next
  * #2): times the per-row Σxm² forms over every numeric column of a lake
  * table, min-of-3 per variant. Variants:
  *  - carry:   the 14-long-op base-1e9 carry split (production path for
  *             unbounded columns)
  *  - fast:    direct long square + long DIV/% split (valid iff
  *             max|xm| ≤ 3.03e9 — the footer-gated path; identical sums)
  *  - decmul:  single decimal(38,0) per-row square, one decimal sum
  *             (post-agg split — would change the oracle's sum shape)
  *  - nostd:   no second moment at all (floor: everything else in the agg)
  */
object StdProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val table = if (args.length > 1) args(1) else "lineitem"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Tables.load(spark, sfDir, table)
    val cols = graft.ingest.Profiler.typedColumns(df, "Numeric")
    println(s"table=$table cols=$cols")

    def aggsFor(variant: String): Seq[org.apache.spark.sql.Column] =
      cols.flatMap { c =>
        val d = col(c).cast("double")
        val xd = s"CAST(`$c` AS DOUBLE)"
        val xf = s"(CASE WHEN isnan($xd) OR abs($xd) = CAST('Infinity' AS DOUBLE)" +
          s" THEN NULL ELSE $xd END)"
        val aa = s"abs(CAST(round($xf * 1000000) AS BIGINT))"
        val base = Seq(count(d).as(s"n__$c"),
          sum(expr(s"CAST($aa AS DECIMAL(38,0))")).as(s"s1__$c"),
          min(d).as(s"mn__$c"), max(d).as(s"mx__$c"))
        val s2 = variant match {
          case "nostd" => Nil
          case "carry" =>
            val aH = s"($aa DIV 1000000000)"
            val aL = s"($aa % 1000000000)"
            val cr = s"(2 * $aH * $aL)"
            val cH = s"($cr DIV 1000000000)"
            val cL = s"($cr % 1000000000)"
            val Lx = s"($cL * 1000000000 + $aL * $aL)"
            Seq(sum(expr(s"CAST($aH * $aH + $cH + ($Lx DIV 1000000000000000000) AS DECIMAL(38,0))")).as(s"hi__$c"),
              sum(expr(s"CAST($Lx % 1000000000000000000 AS DECIMAL(38,0))")).as(s"lo__$c"))
          case "fast" =>
            // timing only: clamp into the gate's valid range so the blind
            // application to ungated columns can't overflow (the real
            // path only takes this form when the footer bound proves it)
            val aaC = s"($aa % 3000000000)"
            val sq = s"($aaC * $aaC)"
            Seq(sum(expr(s"CAST($sq DIV 1000000000000000000 AS DECIMAL(38,0))")).as(s"hi__$c"),
              sum(expr(s"CAST($sq % 1000000000000000000 AS DECIMAL(38,0))")).as(s"lo__$c"))
          case "decmul" =>
            Seq(sum(expr(s"CAST($aa AS DECIMAL(19,0)) * $aa")).as(s"s2__$c"))
        }
        base ++ s2
      }

    for (v <- Seq("nostd", "fast", "carry", "decmul"); _ <- 1 to 1) {
      // warmup once, then min-of-3 timed
      df.agg(aggsFor(v).head, aggsFor(v).tail: _*).collect()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(aggsFor(v).head, aggsFor(v).tail: _*).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"$v%8s: min ${times.min}%.0f ms  (${times.map(t => f"$t%.0f").mkString(", ")})")
    }
    spark.stop()
  }
}
