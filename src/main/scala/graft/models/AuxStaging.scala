package graft.models

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Staging for the reference's auxiliary civic datasets (SURVEY.md §2.1
  * S6: evictions, restaurant inspections, NTA demographics — CSVs whose
  * dictionaries type many columns as STRING with dates/coordinates to
  * be parsed at stage time). The staging step is:
  *
  *   raw (all-string civic CSV) -> typed columns via try-parse ->
  *   validity flags instead of dropped rows (quarantine semantics).
  *
  * ANSI note: Spark 4 sessions run ANSI mode, where a bad `cast` throws
  * mid-job. Staging dirty civic data therefore uses try_* conversions
  * exclusively — a 100 TB ingest must never die on row 73 billion.
  */
object AuxStaging {

  /** try-parse a string column to date with an explicit format. */
  def parseDate(c: Column, fmt: String = "M/d/yyyy"): Column =
    try_to_timestamp(c, lit(fmt)).cast(DateType)

  /** try-parse a numeric string (null on garbage, never ANSI error). */
  def parseDouble(c: Column): Column = c.try_cast(DoubleType)
  def parseLong(c: Column): Column = c.try_cast(LongType)

  /** Stage an evictions-shaped relation (dict: all 20 cols STRING;
    * Executed Date + Latitude/Longitude parsed here). */
  def stageEvictions(raw: DataFrame): DataFrame =
    raw.select(
      col("Court Index Number").as("court_index_number"),
      col("Borough").as("borough"),
      col("Eviction Zip").as("zip"),
      parseDate(col("Executed Date")).as("executed_date"),
      parseDouble(col("Latitude")).as("lat"),
      parseDouble(col("Longitude")).as("lng"),
      col("Residential/Commercial").as("residential_commercial"),
      col("NTA").as("nta"))
      .withColumn("coords_valid",
        col("lat").isNotNull && col("lng").isNotNull &&
          abs(col("lat")) <= 90 && abs(col("lng")) <= 180)
      .withColumn("date_valid", col("executed_date").isNotNull)

  /** Nearest-zone assignment by haversine distance to zone centroids —
    * the first geo-ish mart the reference's staged data implies
    * (SURVEY.md §7.2 slice 4): broadcast the (small) centroid dim,
    * pick argmin distance per point; map-only over the fact side.
    * Points with a NULL coordinate are excluded up front (callers
    * pre-flag them via the staging validity columns) — a NULL lng
    * would otherwise produce NULL distances and an arbitrary
    * nulls-first argmin "assignment". */
  def nearestZone(points: DataFrame, zones: DataFrame,
                  idCol: String, latCol: String, lngCol: String,
                  zoneKeyCol: String, zoneLatCol: String,
                  zoneLngCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val z = zones.select(col(zoneKeyCol).as("zone"),
      col(zoneLatCol).as("zlat"), col(zoneLngCol).as("zlng"))
    val joined = points
      .select(col(idCol).as("id"), col(latCol).as("lat"), col(lngCol).as("lng"))
      .filter(col("lat").isNotNull && col("lng").isNotNull)
      .crossJoin(broadcast(z))
      .withColumn("dist_km",
        round(distLatLng(col("lat"), col("lng"), col("zlat"), col("zlng"), "km"), 6))
    val w = Window.partitionBy("id").orderBy(col("dist_km").asc, col("zone").asc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("zone").as("nearest_zone"), col("dist_km"))
  }
}
