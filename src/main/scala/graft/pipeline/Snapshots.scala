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
    // alias EVERY incoming column (fresh attribute ids): snapshot and
    // incoming frequently share lineage (merge(initialize(df), df, ...)),
    // and a full-outer self-join with shared attributes trips Spark's
    // ambiguous-self-join detection on any same-named data column
    val inc = latest.select(latest.columns.map { c =>
      val nc = if (c == key) "__k"
               else if (c == updatedAtCol) "__ts"
               else s"__i_$c"
      col(c).as(nc)
    }: _*)

    // ONE full-outer join on the business key; closed / untouched /
    // opened all derive from it with filters, so the planner's exchange
    // reuse shares the key shuffle across branches — the previous
    // two-left-joins + two-windows formulation scanned the snapshot ~3x
    // and re-windowed incoming 2x per tick. Explicit side markers:
    // neither the key (NULLs legal) nor the timestamps (NULLs legal)
    // can distinguish "no match" on their own.
    val curM = cur.withColumn("__c", lit(1))
    val incM = inc.withColumn("__i", lit(1))
    val joined = curM.join(incM, curM(key) <=> incM("__k"), "full_outer")

    // "newer": a NULL current timestamp is treated as -infinity (any
    // timestamped incoming version supersedes it) — without the isNull
    // branch the predicate evaluates NULL and a NULL-ts current row
    // could never be superseded, silently dropping its newer incoming
    // versions. A NULL incoming timestamp never supersedes (isNotNull
    // guard), so NULL-vs-NULL is "unchanged". Every branch of this
    // predicate is definite (no NULL booleans leak into the filters).
    val newer = curM("__c").isNotNull && incM("__i").isNotNull &&
      incM("__ts").isNotNull &&
      (curM(updatedAtCol).isNull || curM(updatedAtCol) < incM("__ts"))

    val dataCols = snapshot.columns.filterNot(
      Seq("valid_from", "valid_to", "is_current").contains(_))

    // current rows with a newer incoming version -> closed
    val closed = joined.filter(newer)
      .select(dataCols.map(curM(_)) :+ curM("valid_from") :+
        incM("__ts").cast(TimestampType).as("valid_to") :+
        lit(false).as("is_current"): _*)
    // current rows without a newer version -> unchanged
    val untouched = joined.filter(curM("__c").isNotNull && !newer)
      .select(cur.columns.map(curM(_)): _*)
    // incoming versions that are NEW relative to the snapshot:
    // either a brand-new key, or newer than the current version
    val opened = initialize(
      joined.filter((incM("__i").isNotNull && curM("__c").isNull) || newer)
        .select(dataCols.map { c =>
          if (c == key) incM("__k").as(key)
          else if (c == updatedAtCol) incM("__ts").as(updatedAtCol)
          else incM(s"__i_$c").as(c)
        }: _*),
      updatedAtCol)

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
