package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints, per sketch table, the footer range-gate tier each numeric
  * column lands on (g1 / g2 / carry) and whether Σxm rides a long sum —
  * the observable behind profile_numeric_stats' cpu line. Diagnostic
  * only; mirrors the tier predicates in Profiler.numericWide.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.sketchTables.foreach { t =>
      val df = graft.Tables.load(spark, sfDir, t)
      val gates = graft.ingest.Profiler.parquetGateBounds(df)
      val cols = graft.ingest.Profiler.typedColumns(df, "Numeric")
      val rows = cols.map { c =>
        val gate = gates.get(c).map { case (m, rows) =>
          (math.ceil(m * 1e6) + 2, rows.toDouble) }
        val s1LongOk = gate.exists { case (b, n) => n * b <= 9.0e18 }
        val g1 = gate.exists { case (b, n) => b <= 3.03e9 && n <= 9.0e9 }
        val g2 = !g1 && gate.exists { case (b, n) =>
          val aHm = b / 1e9 + 1
          b <= 9.0e15 && n <= 9.0e9 && n * (aHm * aHm + 2 * aHm + 2) <= 9.0e18 }
        val tier = if (g1) "g1" else if (g2) "g2" else "carry"
        s"$c:$tier${if (s1LongOk) "+s1L" else ""}"
      }
      println(s"== $t gated=${gates.size}/${cols.size} ${rows.mkString(" ")}")
    }
    spark.stop()
  }
}
