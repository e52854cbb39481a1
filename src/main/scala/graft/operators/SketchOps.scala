package graft.operators

import graft.expressions.KmvSketchAgg.kmvDistinct
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-level sketch algebra over the deterministic KMV distinct
  * sketch ([[graft.expressions.KmvSketchAgg]]) — the mergeable-summaries
  * story applied across GROUPS, not just partitions: per-group distinct
  * estimates, pairwise UNION estimates (a KMV of pooled rows IS the
  * merged sketch — KMV union = set-union-then-trim, associative and
  * order-free), and INTERSECTION estimates by inclusion-exclusion.
  * Everything stays a pure function of the input hash SETS, so a SQL
  * oracle replays it exactly.
  */
object SketchOps {

  /** Pairwise distinct-cardinality algebra over groups.
    *
    * Input: a relation with a group column `g` and a 60-bit hash column
    * `h` ([[graft.functions.GraftFunctions.md5Long]] of the counted
    * value). Output, one row per unordered group pair (g_a < g_b):
    * (type_a, type_b, est_a, est_b, est_union, est_intersect) with
    * est_intersect = (est_a + est_b) − est_union — inclusion-exclusion
    * on the KMV estimates (exact when every group is under k; an
    * estimate with compounded KMV error, possibly negative, above it —
    * the documented sketch contract).
    *
    * Scale shape: the group-pair fan-out joins rows against the DISTINCT
    * group dim (broadcast, dimension-sized), so each row is replicated
    * (|groups|−1)× — the operator targets low-cardinality group columns
    * (event types, languages, sources). That fan-out is the one
    * BroadcastNestedLoopJoin in the plan, BY DESIGN: the predicate is
    * non-equi (t ≠ u) and the build side is the handful of group values,
    * so the "nested loop" is a map-only pass over the stream side — the
    * same cost as an explode over a literal group list, without a
    * driver-side collect of the groups. Both aggregations are
    * TypedImperativeAggregate KMVs: the exchange carries one k-long
    * sketch per (map partition, pair), never the distinct rows
    * themselves. */
  def kmvPairAlgebra(df: DataFrame, groupCol: String, hashCol: String,
                     k: Int): DataFrame = {
    val ev = df.select(col(groupCol).as("t"), col(hashCol).as("h"))
    val types = ev.select(col("t").as("u")).distinct()
    val pooled = ev.join(broadcast(types), col("t") =!= col("u"))
      .select(least(col("t"), col("u")).as("type_a"),
              greatest(col("t"), col("u")).as("type_b"), col("h"))
    val unions = pooled.groupBy("type_a", "type_b")
      .agg(kmvDistinct(col("h"), k).as("est_union"))
    val singles = ev.groupBy("t").agg(kmvDistinct(col("h"), k).as("est"))
    unions
      .join(singles.select(col("t").as("type_a"), col("est").as("est_a")),
        Seq("type_a"))
      .join(singles.select(col("t").as("type_b"), col("est").as("est_b")),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
  }
}
