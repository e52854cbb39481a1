package graft

import graft.models.TlcModels
import graft.pipeline.Pipeline._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** Golden-semantics spec for the reference-parity TLC pipeline
  * (AUX_TLC_RIDES + LOCATION_ID_TO_NEIGHBORHOOD + seed), on synthetic
  * fixtures shaped per FIXTURES.md §1/§3. */
class TlcModelsSpec extends SparkSpec {

  private def df(cols: (String, DataType)*)(rows: Row*): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(cols.map { case (n, t) => StructField(n, t, nullable = true) }))

  private val ts = Timestamp.valueOf("2024-01-01 10:00:00")

  private lazy val seedCsv: String = {
    val dir = Files.createTempDirectory("graft-seed")
    val f = dir.resolve("zones.csv")
    Files.writeString(f,
      """locationid,borough,zone,service_zone
        |1,TestBoroA,ZoneA,Boro Zone
        |2,TestBoroB,ZoneB,Yellow Zone
        |3,Unknown,NV,N/A
        |4,EWR,Newark,EWR
        |""".stripMargin)
    f.toString
  }

  private lazy val feeds: Map[String, DataFrame] = Map(
    "RIDES_YELLOW" -> df(
      "tpep_pickup_datetime" -> TimestampType, "tpep_dropoff_datetime" -> TimestampType,
      "PULocationID" -> LongType, "DOLocationID" -> LongType,
      "passenger_count" -> LongType, "trip_distance" -> DoubleType,
      "RatecodeID" -> LongType, "fare_amount" -> DoubleType,
      "tip_amount" -> DoubleType, "tolls_amount" -> DoubleType,
      "Airport_fee" -> DoubleType, "congestion_surcharge" -> DoubleType,
      "improvement_surcharge" -> DoubleType, "mta_tax" -> DoubleType,
      "extra" -> DoubleType, "total_amount" -> DoubleType,
      "payment_type" -> LongType, "store_and_fwd_flag" -> StringType,
      "VendorID" -> LongType)(
      Row(ts, ts, 1L, 2L, 2L, 3.5, 1L, 10.0, 2.0, 0.0, 1.25, 2.5, 0.3, 0.5,
        1.0, 17.55, 2L, "N", 42L),
      Row(ts, ts, 3L, 1L, 1L, 1.0, 1L, 5.0, 0.0, 0.0, 0.0, 0.0, 0.3, 0.5,
        0.0, 5.8, 9L, "Y", 43L)),
    "RIDES_GREEN" -> df(
      "lpep_pickup_datetime" -> TimestampType, "lpep_dropoff_datetime" -> TimestampType,
      "PULocationID" -> LongType, "DOLocationID" -> LongType,
      "passenger_count" -> LongType, "trip_distance" -> DoubleType,
      "trip_type" -> LongType, "ehail_fee" -> DoubleType,
      "RatecodeID" -> LongType, "fare_amount" -> DoubleType,
      "tip_amount" -> DoubleType, "tolls_amount" -> DoubleType,
      "congestion_surcharge" -> DoubleType, "improvement_surcharge" -> DoubleType,
      "mta_tax" -> DoubleType, "extra" -> DoubleType,
      "total_amount" -> DoubleType, "payment_type" -> LongType,
      "store_and_fwd_flag" -> StringType, "VendorID" -> LongType)(
      Row(ts, ts, 2L, 2L, 1L, 2.0, 1L, 0.5, 1L, 8.0, 1.0, 0.0, 0.0, 0.3,
        0.5, 0.0, 9.8, 1L, "N", 44L)),
    "RIDES_FHV" -> df(
      "pickup_datetime" -> TimestampType, "dropOff_datetime" -> TimestampType,
      "PUlocationID" -> LongType, "DOlocationID" -> LongType,
      "SR_Flag" -> LongType, "dispatching_base_num" -> StringType,
      "Affiliated_base_number" -> StringType)(
      Row(ts, ts, 1L, 99L, 1L, "B00001", "B00002")),
    "RIDES_FHVHV" -> df(
      "Hvfhs_license_num" -> StringType, "Pickup_datetime" -> TimestampType,
      "DropOff_datetime" -> TimestampType, "PULocationID" -> LongType,
      "DOLocationID" -> LongType, "trip_miles" -> DoubleType,
      "base_passenger_fare" -> DoubleType, "tips" -> DoubleType,
      "tolls" -> DoubleType, "airport_fee" -> DoubleType,
      "congestion_surcharge" -> DoubleType, "Dispatching_base_num" -> StringType,
      "originating_base_num" -> StringType)(
      Row("HV0003", ts, ts, 4L, 1L, 7.1, 20.0, 3.0, 0.0, 0.0, 2.75, "B02764", "B03001")))

  private lazy val rides: DataFrame = {
    val tmp = Files.createTempDirectory("graft-wh").toString
    val reg = TlcModels.registry(spark, seedCsv, feeds)
    reg.run(RunConfig(env = Core, warehouseRoot = tmp)).resolved("AUX_TLC_RIDES")
  }

  test("row count = sum of feeds (UNION ALL, no dedup)") {
    assert(rides.count() == 5)
  }

  test("dim rename + literal replace (Boro -> Green) in LOCATION_ID_TO_NEIGHBORHOOD") {
    val tmp = Files.createTempDirectory("graft-wh2").toString
    val dim = TlcModels.registry(spark, seedCsv, feeds)
      .run(RunConfig(warehouseRoot = tmp), Seq("LOCATION_ID_TO_NEIGHBORHOOD"))
      .resolved("LOCATION_ID_TO_NEIGHBORHOOD")
    assert(dim.columns.toSeq ==
      Seq("location_id", "borough", "neighborhood", "service_zone"))
    val z1 = dim.filter(dim("location_id") === 1).head
    assert(z1.getString(3) == "Green Zone", "Boro Zone -> Green Zone")
    assert(dim.schema("location_id").dataType == LongType, "decimal seed key cast to long")
  }

  test("left join preserves rides into filtered-out Unknown zones with null borough") {
    val r = rides.filter(rides("pickup_location_id") === 3).head
    assert(r.isNullAt(r.fieldIndex("pickup_borough")),
      "Unknown zone filtered from dim BEFORE join -> null borough, row kept")
    val r2 = rides.filter(rides("dropoff_location_id") === 99).head
    assert(r2.isNullAt(r2.fieldIndex("dropoff_borough")),
      "unseeded location id -> null borough")
  }

  test("vendor_id: '' for FHV (never null), cast-to-string for yellow, license for FHVHV") {
    val v = rides.select("vendor_id", "dispatching_base_num").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(v.contains("") && v("") == Some("B00001"), "FHV vendor_id is '' not null")
    assert(v.contains("42") && v.contains("HV0003"))
  }

  test("payment decode emitted AS payment_type: 2 -> Cash, unmapped 9 -> null, FHV -> null") {
    // AUX_TLC_RIDES.sql:64: the decoded label IS the payment_type column
    // (string) in the 28-col output; the raw code does not survive.
    assert(rides.schema("payment_type").dataType == StringType)
    val byVendor = rides.select("vendor_id", "payment_type").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(byVendor("42") == "Cash", "code 2 -> Cash")
    assert(byVendor("43") == null, "unmapped code 9 -> null (CASE with no ELSE)")
    assert(byVendor("") == null, "FHV has no payment_type column -> null")
  }

  test("28-column output schema in the reference's order") {
    assert(rides.columns.toSeq == Seq(
      "pickup_datetime", "dropoff_datetime",
      "pickup_location_id", "pickup_borough", "pickup_neighborhood",
      "dropoff_location_id", "dropoff_borough", "dropoff_neighborhood",
      "passenger_count", "trip_distance", "trip_type", "rate_code_id",
      "fare_amount", "tip_amount", "tolls_amount", "airport_fee",
      "ehail_fee", "congestion_surcharge", "improvement_surcharge",
      "mta_tax", "extra", "total_amount", "payment_type",
      "store_and_fwd_flag", "sr_flag", "vendor_id",
      "dispatching_base_num", "affiliated_base_number"))
  }

  test("FHVHV affiliated_base_number maps from originating_base_num") {
    val hv = rides.filter(rides("vendor_id") === "HV0003").head
    assert(hv.getString(hv.fieldIndex("affiliated_base_number")) == "B03001")
  }

  test("date-partitioned table materialization lays out partition dirs") {
    // SURVEY §4: the reference CANNOT partition its external tables; the
    // Spark warehouse can and should (documented divergence).
    val tmp = Files.createTempDirectory("graft-wh3").toString
    val reg = TlcModels.registry(spark, seedCsv, feeds)
    val rides = reg.run(RunConfig(warehouseRoot = tmp)).resolved("AUX_TLC_RIDES")
    val r2 = new graft.pipeline.Pipeline.Registry(spark)
    r2.register(graft.pipeline.Pipeline.Model(
      "RIDES_BY_DATE", "3_PREP", Nil, graft.pipeline.Pipeline.Table,
      partitionBy = Seq("pickup_date")) { _ =>
      rides.withColumn("pickup_date",
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("pickup_datetime")))
    })
    r2.run(RunConfig(warehouseRoot = tmp), Seq("RIDES_BY_DATE"))
    val dir = new java.io.File(s"$tmp/CORE/3_PREP/RIDES_BY_DATE")
    val parts = dir.listFiles().map(_.getName).filter(_.startsWith("pickup_date="))
    assert(parts.nonEmpty, s"expected hive-style partition dirs in $dir")
    // partition pruning: reading one date reads only that partition
    val one = spark.read.parquet(dir.toString)
      .filter(org.apache.spark.sql.functions.col("pickup_date") === "2024-01-01")
    assert(one.count() == 5)
  }

  test("full 4-layer DAG: seed -> dim -> stg -> mart materializes in topo order") {
    // the mart layer the reference declares (3_PREP/4_MART) but never
    // built: borough-level ride rollup on top of AUX_TLC_RIDES
    val tmp = Files.createTempDirectory("graft-wh4").toString
    val reg = TlcModels.registry(spark, seedCsv, feeds)
    reg.register(Model("MART_RIDES_BY_BOROUGH", "4_MART",
        Seq("AUX_TLC_RIDES"), Table) { deps =>
      import org.apache.spark.sql.functions._
      deps("AUX_TLC_RIDES")
        .groupBy(col("pickup_borough"))
        .agg(count(lit(1)).as("n_rides"),
          sum(col("total_amount")).as("sum_total"))
    })
    val res = reg.run(RunConfig(warehouseRoot = tmp))
    val order = res.order
    assert(order.indexOf("x_seed_taxi_zone_lookup") <
      order.indexOf("LOCATION_ID_TO_NEIGHBORHOOD"))
    assert(order.indexOf("LOCATION_ID_TO_NEIGHBORHOOD") <
      order.indexOf("AUX_TLC_RIDES"))
    assert(order.indexOf("AUX_TLC_RIDES") <
      order.indexOf("MART_RIDES_BY_BOROUGH"))
    val mart = res.resolved("MART_RIDES_BY_BOROUGH")
    assert(mart.count() > 0)
    // mart persisted as a table under the env prefix
    assert(new java.io.File(s"$tmp/CORE/4_MART/MART_RIDES_BY_BOROUGH").exists())
  }

  test("typed null padding: FHV fare_amount is null double, green airport_fee null") {
    val fhv = rides.filter(rides("sr_flag") === 1).head
    assert(fhv.isNullAt(fhv.fieldIndex("fare_amount")))
    assert(rides.schema("fare_amount").dataType == DoubleType)
    val green = rides.filter(rides("trip_type").isNotNull).head
    assert(green.isNullAt(green.fieldIndex("airport_fee")))
    assert(green.getDouble(green.fieldIndex("ehail_fee")) == 0.5)
  }
}
