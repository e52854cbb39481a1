package graft.geo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broadcast spatial join: assign each (lng, lat) point to the polygon
  * zone containing it — the staged reference capability (lat/lng fact
  * columns x the 2327-polygon NTA dimension, SURVEY.md §2.1 S7).
  *
  * Shape chosen for scale: the polygon dimension is SMALL (thousands of
  * zones) and the point side is the 100 TB fact — so parse the WKB once
  * on the driver, broadcast the parsed polygons (with cached bboxes),
  * and stream the fact through a map-only stage. No shuffle of the
  * points; bbox rejection makes the per-point cost ~O(candidate zones).
  * (A billion-polygon right side would need an R-tree grid join — out
  * of scope for the reference's data model.)
  */
object GeoJoin {

  /** @param points  fact side: idCol, lngCol, latCol
    * @param zones   dim side: zoneKeyCol (string), wkbCol (binary WKB)
    * @return (idCol, lng, lat, zone) — zone null when no polygon matches
    */
  def assignZones(points: DataFrame, zones: DataFrame,
                  idCol: String, lngCol: String, latCol: String,
                  zoneKeyCol: String, wkbCol: String): DataFrame = {
    val spark = points.sparkSession
    // dim is small by contract: parse once, broadcast parsed form.
    // Sorted by zone key so first-containing-polygon wins DETERMINISTICALLY
    // for boundary/overlap points (collect() order is partitioning-dependent).
    val parsed: Array[(String, Wkb.Geometry)] = zones
      .select(col(zoneKeyCol), col(wkbCol)).collect()
      .map { r: Row => (r.getString(0), Wkb.parse(r.getAs[Array[Byte]](1))) }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(parsed)

    // the id column keeps its OWN type: force-casting to Long would
    // silently null every non-numeric id (e.g. Citibike's string
    // ride_id), destroying row identity with no error
    val outSchema = StructType(Seq(
      StructField(idCol, points.schema(idCol).dataType),
      StructField("lng", DoubleType),
      StructField("lat", DoubleType),
      StructField("zone", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)

    points.select(col(idCol), col(lngCol).cast(DoubleType),
        col(latCol).cast(DoubleType))
      .mapPartitions { rows =>
        val zs = bc.value
        rows.map { r =>
          // NULL coords (exactly the rows a staging validity flag marks)
          // must yield a NULL zone, not an NPE from getDouble on null
          if (r.isNullAt(1) || r.isNullAt(2)) {
            Row(r.get(0),
              if (r.isNullAt(1)) null else r.getDouble(1),
              if (r.isNullAt(2)) null else r.getDouble(2), null)
          } else {
            val x = r.getDouble(1); val y = r.getDouble(2)
            var zone: String = null
            var i = 0
            while (zone == null && i < zs.length) {
              if (Wkb.contains(zs(i)._2, x, y)) zone = zs(i)._1
              i += 1
            }
            Row(r.get(0), x, y, zone)
          }
        }
      }(enc)
  }
}
