package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's skew
  * handling isn't enough (e.g. a single hot join key at 100 TB). The salted
  * plan trades a `saltFactor`× replication of the small side for even
  * partitioning of the hot keys on the big side. Results are identical to
  * the unsalted equivalents (SaltingSpec proves it).
  */
object Salting {

  /** Collision-free scratch column name for a set of frames. */
  private def saltCol(dfs: DataFrame*): String = {
    var name = "__salt"
    while (dfs.exists(_.columns.contains(name))) name += "_"
    name
  }

  /** Per-row salt independent of row CONTENT: duplicate rows of a hot key
    * must land in different buckets (a content hash would send them all to
    * one reducer — the exact skew this helper exists to break). Correctness
    * never depends on WHICH salt a row gets, only that the small side covers
    * all of them, so the partition-dependent id is safe.
    */
  private def rowSalt(saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int")

  /** Equi-join with a salted key: the big (skewed) side gets a per-row salt,
    * the small side is exploded `saltFactor`× so every salted key still
    * finds its match.
    */
  def saltedJoin(big: DataFrame, bigKey: String, small: DataFrame,
                 smallKey: String, saltFactor: Int = 8): DataFrame = {
    val s = saltCol(big, small)
    val saltedBig = big.withColumn(s, rowSalt(saltFactor))
    val saltedSmall = small
      .withColumn(s, explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey)
          && saltedBig(s) === saltedSmall(s))
      .drop(s)
  }

  /** Skew-safe aggregation: two-level groupBy — first on (key, salt) so hot
    * keys spread over `saltFactor` reducers, then re-aggregate on key.
    * Caller supplies partial and final aggregate pairs that compose (sum/sum,
    * count/sum, min/min, ...).
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
                partial: Seq[(String, Column)], finals: Seq[Column]): DataFrame = {
    val s = saltCol(df)
    val salted = df.withColumn(s, rowSalt(saltFactor))
    val first = salted.groupBy(col(key), col(s))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    first.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }

  /** Join-key skew audit — the diagnosis that decides whether [[saltedJoin]]
    * (and with what factor) is needed at all: top-k hottest keys with their
    * row share, plus the global shape (distinct keys, mean rows/key, hot/
    * mean ratio, and the salt factor that would level the hottest key to
    * the mean). One keyed count aggregate + a 1-row broadcast + a bounded
    * top-k; all-integer output (ratio ×1000, share in ppm), so the report
    * is engine-exact.
    *
    * @return top-k rows (rank, key, rows, share_ppm, n_keys, mean_rows,
    *         skew_x1000, suggested_salt), hottest first
    */
  def skewAudit(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = graft.Caching.temp(
      df.filter(col(key).isNotNull)
        .groupBy(col(key).as("key")).agg(count(lit(1)).as("rows")))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"), sum("rows").as("n_rows"),
      max("rows").as("max_rows"))
      .withColumn("mean_rows", expr("greatest(n_rows DIV n_keys, 1)"))
      .withColumn("skew_x1000", expr("(max_rows * 1000) DIV mean_rows"))
      .withColumn("suggested_salt",
        expr("(max_rows + mean_rows - 1) DIV mean_rows"))
    counts
      .orderBy(col("rows").desc, col("key").asc)
      .limit(topK)
      .crossJoin(broadcast(stats))
      .withColumn("share_ppm", expr("(rows * 1000000) DIV n_rows"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rows").desc, col("key").asc)).cast("long"))
      .select("rank", "key", "rows", "share_ppm", "n_keys", "mean_rows",
        "skew_x1000", "suggested_salt")
  }
}
