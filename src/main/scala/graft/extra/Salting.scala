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

  /** Equi-join with a salted key: the big (skewed) side gets a deterministic
    * per-row salt, the small side is exploded `saltFactor`× so every salted
    * key still finds its match.
    */
  def saltedJoin(big: DataFrame, bigKey: String, small: DataFrame,
                 smallKey: String, saltFactor: Int = 8): DataFrame = {
    // deterministic salt from the whole row hash (not rand(): keeps the
    // join reproducible and retry-safe under speculative execution)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltFactor)))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey)
          && saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }

  /** Skew-safe aggregation: two-level groupBy — first on (key, salt) so hot
    * keys spread over `saltFactor` reducers, then re-aggregate on key.
    * Caller supplies partial and final aggregate pairs that compose (sum/sum,
    * count/sum, min/min, ...).
    */
  def saltedAgg(df: DataFrame, key: String, saltFactor: Int,
                partial: Seq[(String, Column)], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(saltFactor)))
    val first = salted.groupBy(col(key), col("__salt"))
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    first.groupBy(col(key)).agg(finals.head, finals.tail: _*)
  }
}
