package graft

import graft.models.AuxStaging
import org.apache.spark.sql.functions._

class AuxStagingSpec extends SparkSpec {
  import spark.implicits._

  test("evictions staging: try-parse dates/coords, quarantine flags, no ANSI errors") {
    val raw = Seq(
      ("C1", "BRONX", "10453", "3/14/2023", "40.85", "-73.91", "Residential", "BX01"),
      ("C2", "QUEENS", "11101", "not a date", "garbage", "-73.94", "Commercial", "QN31"),
      ("C3", "BROOKLYN", "11201", "12/1/2022", "140.0", "-73.99", "Residential", "BK09"))
      .toDF("Court Index Number", "Borough", "Eviction Zip", "Executed Date",
        "Latitude", "Longitude", "Residential/Commercial", "NTA")
    val staged = AuxStaging.stageEvictions(raw).cache()
    assert(staged.count() == 3, "dirty rows kept, not dropped")
    val byId = staged.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("C1").getAs[Boolean]("coords_valid"))
    assert(byId("C1").getAs[java.sql.Date]("executed_date").toString == "2023-03-14")
    assert(!byId("C2").getAs[Boolean]("date_valid"), "unparseable date flagged")
    assert(!byId("C2").getAs[Boolean]("coords_valid"), "garbage latitude flagged")
    assert(!byId("C3").getAs[Boolean]("coords_valid"), "lat 140 out of range")
  }

  test("nearestZone assigns argmin-haversine centroid deterministically") {
    val zones = Seq(("bronx", 40.85, -73.88), ("bk", 40.65, -73.95),
      ("si", 40.58, -74.15)).toDF("zone", "zlat", "zlng")
    val pts = Seq((1L, 40.86, -73.89), (2L, 40.64, -73.96), (3L, 40.60, -74.10))
      .toDF("id", "lat", "lng")
    val got = AuxStaging.nearestZone(pts, zones, "id", "lat", "lng",
        "zone", "zlat", "zlng")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "bronx", 2L -> "bk", 3L -> "si"))
  }
}
