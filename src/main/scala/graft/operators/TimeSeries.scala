package graft.operators

import graft.functions.GraftFunctions.exactSum
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Time-series resampling over event relations — the gap-fill /
  * regularization pass that turns irregular events into a dense
  * per-key calendar (feature tables, SLA dashboards, training windows
  * need the ABSENT days as rows, not holes).
  */
object TimeSeries {

  /** Daily gap fill per key: aggregate events to (key, day) rows, then
    * densify each key's span (min..max day, a per-key `sequence`
    * explode) and forward-fill the value over gaps.
    *
    * Output: (key, day, n_events, day_value, filled_value) where
    * day_value is NULL on gap days (n_events = 0) and filled_value
    * carries the last seen day_value forward. Sums are exact decimal
    * ([[exactSum]]) so the relation hash-replays cross-engine.
    *
    * Scale shape: one (key, day)-keyed aggregation with map-side
    * combine; the span aggregate is key-sized; the grid explode emits
    * span-length rows per key (the DENSIFIED size — the operator's
    * output contract, not overhead); the forward fill is one key-keyed
    * window. Nothing driver-side, nothing quadratic; skewed long-lived
    * keys cost their own span only. */
  def gapFillDaily(df: DataFrame, tsCol: String, keyCol: String,
                   valCol: String): DataFrame = {
    val perDay = df
      .select(col(keyCol).as("key"), col(tsCol).cast(DateType).as("day"),
        col(valCol).as("v"))
      .groupBy("key", "day")
      .agg(count(lit(1)).as("n_events"), exactSum(col("v")).as("day_value"))
    val span = perDay.groupBy("key")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col("key"),
      explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy("key").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perDay, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(w)
          .as("filled_value"))
  }
}
