package graft

import graft.models.CitibikeModels
import graft.pipeline.Pipeline._
import org.apache.spark.sql.Row
import java.nio.file.Files
import java.sql.Timestamp

class CitibikeModelsSpec extends SparkSpec {

  private val ts0 = Timestamp.valueOf("2024-06-01 10:00:00")
  private val ts1 = Timestamp.valueOf("2024-06-01 10:30:00")

  // Midtown -> Downtown ~ 8.4 km straight line
  private lazy val trips = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("r1", "classic_bike", ts0, ts1, "W 52 St", "S1", "Wall St", "S2",
        40.7616, -73.9857, 40.7074, -74.0113, "member"),
      Row("r2", "electric_bike", ts0, ts1, "Wall St", "S2", "W 52 St", "S1",
        40.7074, -74.0113, 40.7616, -73.9857, "casual"),
      Row("r3", "classic_bike", ts0, ts1, "Broken", "S3", "Nowhere", "S4",
        null, null, 40.7, -74.0, "member")),
    CitibikeModels.tripsSchema)

  private lazy val run = {
    val tmp = Files.createTempDirectory("graft-cb").toString
    CitibikeModels.registry(spark, trips)
      .run(RunConfig(warehouseRoot = tmp))
  }

  test("staging derives haversine distance, duration, speed; bad coords flagged") {
    val stg = run.resolved("CITIBIKE_TRIPS_STG")
    val r1 = stg.filter(stg("ride_id") === "r1").head
    assert(r1.getBoolean(r1.fieldIndex("coords_valid")))
    val km = r1.getDouble(r1.fieldIndex("trip_km"))
    assert(math.abs(km - 6.4) < 0.5, s"midtown->wall st straight line ~6.4km, got $km")
    assert(r1.getLong(r1.fieldIndex("duration_s")) == 1800L)
    val kmh = r1.getDouble(r1.fieldIndex("avg_kmh"))
    assert(math.abs(kmh - km * 2) < 0.01, "30-min trip -> speed = 2x distance")

    val r3 = stg.filter(stg("ride_id") === "r3").head
    assert(!r3.getBoolean(r3.fieldIndex("coords_valid")))
    assert(r3.isNullAt(r3.fieldIndex("trip_km")), "invalid coords -> null distance, row kept")

    // symmetric trips have equal distance (haversine symmetry)
    val r2 = stg.filter(stg("ride_id") === "r2").head
    assert(r2.getDouble(r2.fieldIndex("trip_km")) == km)
  }

  test("station dim distills unique stations from both endpoints") {
    val dim = run.resolved("CITIBIKE_STATIONS")
    val byId = dim.collect().map(r => r.getString(0) ->
      r.getLong(r.fieldIndex("n_trip_endpoints"))).toMap
    assert(byId.keySet == Set("S1", "S2", "S3", "S4"))
    assert(byId("S1") == 2 && byId("S2") == 2, "S1/S2 appear as start and end")
  }
}
