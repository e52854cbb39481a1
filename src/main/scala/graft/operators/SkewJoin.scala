package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins. AQE's skew-join handling covers sort-merge
  * joins automatically (left enabled); this explicit salted join is for
  * the cases AQE can't fix — e.g. a hot key so large that even one
  * split of it overwhelms a task, or non-SMJ plans.
  *
  * Semantics: identical to `left.join(right, key, inner)`; the salt is
  * an internal fan-out column, never visible in the result.
  */
object SkewJoin {

  /** Inner equi-join with the left side's hot keys spread over
    * `saltBuckets` partitions: left rows get a salt in [0, n); the
    * (smaller) right side is replicated n times so every salted left
    * partition finds its match. Join key co-location cost becomes
    * max(|hot key| / n) instead of |hot key|.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(lit((0 until saltBuckets).toArray)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
