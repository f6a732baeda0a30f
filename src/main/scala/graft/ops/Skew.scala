package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (100 TB concern: one hot key serializes a
  * shuffle join into a single straggler task).
  *
  * First line of defense is AQE's skew-join splitting (on by default in
  * Spark 4 — `spark.sql.adaptive.skewJoin.enabled`); explicit salting is
  * for the cases AQE can't fix: skewed AGGREGATION keys, and joins where
  * the skew is known ahead of time and the small side is replicable.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt
    * in [0, buckets) derived from a uniqueness column; the small side is
    * replicated ×buckets. The hot key's rows then spread over `buckets`
    * tasks instead of one. Result is row-identical to
    * `large.join(small, key)`. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFrom: Column, buckets: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt)
    * first — the hot key becomes `buckets` partial rows — then merge.
    * Equivalent to groupBy(key).agg(sum/count). */
  def skewSafeSumCount(df: DataFrame, key: String, valueCol: String,
      saltFrom: Column, buckets: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(key))
      .agg(sum(col("__s")).as("sum_value"), sum(col("__c")).as("n"))
}
