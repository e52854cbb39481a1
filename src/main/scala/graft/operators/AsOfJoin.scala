package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join: for each left row, attach the latest
  * right row with the same key and rightTime <= leftTime.
  *
  * Spark has no native ASOF join operator; the naive rendering
  * (equi-join on key + time filter + row_number) explodes to
  * O(|matches per key|) intermediate rows. This is the scalable
  * union-sort-window form instead:
  *
  *   1. tag right rows 0 / left rows 1, union on (key, time, tag)
  *   2. one shuffle+sort per key on (time, tag) — right sorts first on
  *      time ties, making the bound inclusive (rightTime == leftTime
  *      is visible)
  *   3. `last(payload, ignoreNulls)` running window carries the most
  *      recent right payload forward
  *   4. keep the left rows
  *
  * Cost: one shuffle of |L|+|R| skinny rows, no join blowup — the same
  * shape at 100 TB, where both sides arrive partitioned by key.
  *
  * Determinism requires the right side to be unique per (key, time);
  * callers pre-aggregate ties (see CoreQueries.q19AsofJoin).
  */
object AsOfJoin {

  /** @param left       left relation
    * @param right      right relation, unique per (key, time)
    * @param key        join key column name (same name both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param payload    right columns to carry (attached with last-known value; null when no right row is at or before leftTime)
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // SQL join semantics: a NULL key matches nothing, and a NULL right
    // time satisfies no `leftTime >= rightTime` bound. The union-window
    // formulation would otherwise co-partition NULL keys (matching them)
    // and sort NULL times FIRST (matching everything), so both are
    // dropped from the right side. NULL-key/time left rows keep flowing
    // and get NULL payloads — left-join behavior.
    val rightNonNull = right.filter(col(key).isNotNull && col(rightTime).isNotNull)
    // the payload travels as ONE struct so the window carries whole
    // right ROWS: per-column last(ignoreNulls) would stitch non-null
    // values from DIFFERENT right rows into one that never existed.
    val payloadT = StructType(payload.map(p =>
      StructField(p, right.schema(p).dataType, nullable = true)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__t") :+ col("__tag")) :+
        lit(null).cast(payloadT).as("__p"): _*)
    val r = rightNonNull
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .select((leftCols.map(c => (if (c == key) col(key) else lit(null).cast(left.schema(c).dataType)).as(c)) :+
        col("__t") :+ col("__tag")) :+ struct(payload.map(col): _*).as("__p"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__last.$p").as(p)): _*)
  }
}
