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
}
