package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCD2 snapshots — the reference declares a dbt `snapshots/` directory
  * but ships none (SURVEY.md §2.7 D7). This is the Spark-native
  * equivalent of dbt's timestamp-strategy snapshot: track every version
  * of a mutable dimension row with [valid_from, valid_to) ranges and an
  * `is_current` flag.
  *
  * Storage is plain parquet (no table format in this environment), so a
  * snapshot tick rewrites the snapshot table — correct and idempotent;
  * on a real deployment the same merge would target a Delta/Iceberg
  * table with MERGE INTO and only touched files rewrite. The merge
  * itself is one hash join on the business key + a union: shuffle cost
  * O(|snapshot| + |incoming|), no driver-side row handling.
  */
object Snapshots {

  val validTo999: java.sql.Timestamp = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")

  /** Initialize a snapshot from the first observed state. */
  def initialize(current: DataFrame, updatedAtCol: String): DataFrame =
    current
      .withColumn("valid_from", col(updatedAtCol).cast(TimestampType))
      .withColumn("valid_to", lit(validTo999))
      .withColumn("is_current", lit(true))

  /** Merge one new observation of the source into the snapshot.
    *
    * Rules (dbt timestamp strategy):
    *  - unchanged rows (same key, same updatedAt) pass through;
    *  - changed rows (same key, newer updatedAt) close the current
    *    version (valid_to = new updatedAt, is_current = false) and add
    *    the new version;
    *  - new keys are inserted as current;
    *  - keys absent from `incoming` are left open (dbt semantics: a
    *    snapshot records what it sees, absence is not deletion);
    *  - a NULL business key is treated as one key value (null-safe
    *    `<=>` joins), so NULL-key rows version-chain normally instead
    *    of being re-inserted as brand-new on every merge tick.
    */
  def merge(snapshot: DataFrame, incoming: DataFrame, key: String,
            updatedAtCol: String): DataFrame = {
    // coalesce makes the cur/hist partition TOTAL: a row with NULL
    // is_current (hand-repaired table, external writer) would match
    // neither filter and silently vanish from the merged output
    val cur = snapshot.filter(coalesce(col("is_current"), lit(false)))
    val hist = snapshot.filter(!coalesce(col("is_current"), lit(false)))
    // one observation per key per merge: keep only the LATEST incoming
    // version (ties broken arbitrarily would corrupt the chain — a
    // deterministic row_number on (ts desc) guards batches that carry
    // several versions of one key).
    // xxhash64 over the full row as the tiebreak: equal-timestamp
    // versions of one key would otherwise be picked by shuffle-internal
    // order, so a retry could open a DIFFERENT version than the first
    // attempt (deterministic within Spark is all that is needed here —
    // snapshots have no cross-engine oracle)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(updatedAtCol).desc,
        xxhash64(incoming.columns.map(col): _*).asc)
    val latest = incoming
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val inc = latest
      .withColumnRenamed(key, "__k")
      .withColumnRenamed(updatedAtCol, "__ts")

    // "newer": a NULL current timestamp is treated as -infinity (any
    // timestamped incoming version supersedes it) — without the isNull
    // branch both this predicate and the `fresh` filter evaluate NULL
    // and a NULL-ts current row could never be superseded, silently
    // dropping its newer incoming versions. A NULL incoming timestamp
    // never supersedes (isNotNull guard), so NULL-vs-NULL is "unchanged".
    val joined = cur.join(inc,
      cur(key) <=> col("__k") && col("__ts").isNotNull &&
        (cur(updatedAtCol).isNull || cur(updatedAtCol) < col("__ts")), "left")

    val dataCols = snapshot.columns.filterNot(
      Seq("valid_from", "valid_to", "is_current").contains(_))

    // current rows with a newer incoming version -> closed. (__ts is
    // non-null on every matched row, so it keys "did the join match"
    // even when the business key itself is NULL.)
    val closed = joined.filter(col("__ts").isNotNull)
      .select(dataCols.map(cur(_)) :+ cur("valid_from") :+
        col("__ts").cast(TimestampType).as("valid_to") :+
        lit(false).as("is_current"): _*)
    // current rows without a newer version -> unchanged
    val untouched = joined.filter(col("__ts").isNull)
      .select(cur.columns.map(cur(_)): _*)

    // incoming versions that are NEW relative to the snapshot:
    // either a brand-new key, or newer than the current version
    // explicit match marker: neither __ck (NULL keys legal) nor __cts
    // (NULL timestamps legal) can distinguish "no match" on their own
    val curKeys = cur.select(col(key).as("__ck"), col(updatedAtCol).as("__cts"))
      .withColumn("__matched", lit(1))
    val fresh = inc.join(curKeys, col("__k") <=> col("__ck"), "left")
      .filter(col("__matched").isNull ||
        (col("__ts").isNotNull &&
          (col("__cts").isNull || col("__cts") < col("__ts"))))
      .drop("__ck", "__cts", "__matched")
      .withColumnRenamed("__k", key)
      .withColumnRenamed("__ts", updatedAtCol)
    val opened = initialize(fresh, updatedAtCol)

    hist.unionByName(closed).unionByName(untouched).unionByName(opened)
  }

  /** Point-in-time view: the version of each row valid at `asOf`.
    * NULL valid_from (a key first observed with a NULL timestamp) is
    * -infinity — the same rule merge() applies to NULL current
    * timestamps — so such rows are visible at every point in time
    * instead of being invisible at all of them. */
  def asOf(snapshot: DataFrame, asOf: java.sql.Timestamp): DataFrame =
    snapshot.filter(
      (col("valid_from").isNull || col("valid_from") <= lit(asOf)) &&
        lit(asOf) < col("valid_to"))
}
