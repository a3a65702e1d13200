package graft.tools
import org.apache.spark.sql.functions._
object RndProbe {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session("rndprobe")
    import spark.implicits._
    val xs = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, -0.5, -1e-300).toDF("x")
    xs.select(col("x"), round(col("x"), 0).as("r"),
        graft.functions.VectorOps.round0(col("x")).as("n")).collect()
      .foreach(r => println(s"PROBE ${r.getDouble(0)} -> " +
        (if (r.isNullAt(1)) "NULL" else r.getDouble(1).toString) + " native " +
        (if (r.isNullAt(2)) "NULL" else r.getDouble(2).toString)))
    spark.stop()
  }
}
