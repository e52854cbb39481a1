package graft.models

import graft.functions.GraftFunctions._
import graft.harmonize.Harmonize._
import graft.pipeline.Pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's implemented model surface, Spark-native
  * (SURVEY.md §2; dbt/nycitibike_transform/models/...):
  *
  *  - seed `x_seed_taxi_zone_lookup` (265-row CSV, locationid NUMERIC ->
  *    cast Long at dim build for join parity — SURVEY.md §2.4 type note)
  *  - `LOCATION_ID_TO_NEIGHBORHOOD` (table materialization; rename +
  *    literal replace — LOCATION_ID_TO_NEIGHBORHOOD.sql:1-9)
  *  - `AUX_TLC_RIDES` (view; the 24-column harmonized UNION ALL of the
  *    four TLC feeds + dim filter + double left join + payment decode —
  *    AUX_TLC_RIDES.sql:1-76)
  */
object TlcModels {

  /** Canonical 24-column fact schema of the harmonized union
    * (AUX_TLC_RIDES.sql:3-8 dict keys, types per FIXTURES.md §2). */
  val canonicalFact: Seq[CanonicalCol] = Seq(
    CanonicalCol("vendor_id", StringType, default = lit("")), // '' not NULL (AUX_TLC_RIDES.sql:16-17)
    CanonicalCol("pickup_datetime", TimestampType),
    CanonicalCol("dropoff_datetime", TimestampType),
    CanonicalCol("pickup_location_id", LongType),
    CanonicalCol("dropoff_location_id", LongType),
    CanonicalCol("passenger_count", LongType),
    CanonicalCol("trip_distance", DoubleType),
    CanonicalCol("trip_type", LongType),
    CanonicalCol("rate_code_id", LongType),
    CanonicalCol("fare_amount", DoubleType),
    CanonicalCol("tip_amount", DoubleType),
    CanonicalCol("tolls_amount", DoubleType),
    CanonicalCol("airport_fee", DoubleType),
    CanonicalCol("ehail_fee", DoubleType),
    CanonicalCol("congestion_surcharge", DoubleType),
    CanonicalCol("improvement_surcharge", DoubleType),
    CanonicalCol("mta_tax", DoubleType),
    CanonicalCol("extra", DoubleType),
    CanonicalCol("total_amount", DoubleType),
    CanonicalCol("payment_type", LongType),
    CanonicalCol("store_and_fwd_flag", StringType),
    CanonicalCol("sr_flag", LongType),
    CanonicalCol("dispatching_base_num", StringType),
    CanonicalCol("affiliated_base_number", StringType),
  )

  /** Per-feed {canonical -> native} rename maps (AUX_TLC_RIDES.sql:3-8;
    * native column names per FIXTURES.md §1). Absent = omitted. */
  val yellowMap: Map[String, String] = Map(
    "vendor_id" -> "VendorID",
    "pickup_datetime" -> "tpep_pickup_datetime",
    "dropoff_datetime" -> "tpep_dropoff_datetime",
    "pickup_location_id" -> "PULocationID",
    "dropoff_location_id" -> "DOLocationID",
    "passenger_count" -> "passenger_count",
    "trip_distance" -> "trip_distance",
    "rate_code_id" -> "RatecodeID",
    "fare_amount" -> "fare_amount",
    "tip_amount" -> "tip_amount",
    "tolls_amount" -> "tolls_amount",
    "airport_fee" -> "Airport_fee",
    "congestion_surcharge" -> "congestion_surcharge",
    "improvement_surcharge" -> "improvement_surcharge",
    "mta_tax" -> "mta_tax",
    "extra" -> "extra",
    "total_amount" -> "total_amount",
    "payment_type" -> "payment_type",
    "store_and_fwd_flag" -> "store_and_fwd_flag",
  )

  val greenMap: Map[String, String] =
    yellowMap - "airport_fee" ++ Map(
      "pickup_datetime" -> "lpep_pickup_datetime",
      "dropoff_datetime" -> "lpep_dropoff_datetime",
      "trip_type" -> "trip_type",
      "ehail_fee" -> "ehail_fee",
    )

  val fhvMap: Map[String, String] = Map(
    "pickup_datetime" -> "pickup_datetime",
    "dropoff_datetime" -> "dropOff_datetime",
    "pickup_location_id" -> "PUlocationID",
    "dropoff_location_id" -> "DOlocationID",
    "sr_flag" -> "SR_Flag",
    "dispatching_base_num" -> "dispatching_base_num",
    "affiliated_base_number" -> "Affiliated_base_number",
  )

  val fhvhvMap: Map[String, String] = Map(
    "vendor_id" -> "Hvfhs_license_num", // string; cast unifies (AUX_TLC_RIDES.sql:18-19)
    "pickup_datetime" -> "Pickup_datetime",
    "dropoff_datetime" -> "DropOff_datetime",
    "pickup_location_id" -> "PULocationID",
    "dropoff_location_id" -> "DOLocationID",
    "trip_distance" -> "trip_miles",
    "fare_amount" -> "base_passenger_fare",
    "tip_amount" -> "tips",
    "tolls_amount" -> "tolls",
    "airport_fee" -> "airport_fee",
    "congestion_surcharge" -> "congestion_surcharge",
    "dispatching_base_num" -> "Dispatching_base_num",
    "affiliated_base_number" -> "originating_base_num",
  )

  /** Seed schema: locationid is NUMERIC in the reference
    * (dbt_project.yml:19-21 +column_types) = Decimal(38,9). */
  val seedSchema: StructType = StructType(Seq(
    StructField("locationid", DecimalType(38, 9)),
    StructField("borough", StringType),
    StructField("zone", StringType),
    StructField("service_zone", StringType)))

  /** Build the full registry over the four source feeds + seed path.
    * Sources are passed in (tests use synthetic fixtures) — the catalog
    * boundary stays out of model logic, as in dbt's source()/ref() split.
    */
  def registry(
      spark: SparkSession,
      seedCsvPath: String,
      feeds: Map[String, DataFrame]): Registry = {
    val r = new Registry(spark)

    r.register(Model("x_seed_taxi_zone_lookup", "2_DIM___AUX_TLC", Nil, Table) { _ =>
      spark.read.option("header", "true").schema(seedSchema).csv(seedCsvPath)
    })

    // LOCATION_ID_TO_NEIGHBORHOOD.sql:1-9 — table materialization,
    // rename locationid->location_id / zone->neighborhood, literal
    // replace Boro->Green in service_zone. Dim key cast to Long here
    // (join parity with the int64 fact keys, SURVEY.md §2.4).
    r.register(Model("LOCATION_ID_TO_NEIGHBORHOOD", "2_DIM___AUX_TLC",
        Seq("x_seed_taxi_zone_lookup"), Table) { deps =>
      deps("x_seed_taxi_zone_lookup").select(
        col("locationid").cast(LongType).as("location_id"),
        col("borough"),
        col("zone").as("neighborhood"),
        replaceLit(col("service_zone"), "Boro", "Green").as("service_zone"))
    })

    // AUX_TLC_RIDES.sql — view materialization: harmonized UNION ALL of
    // the four feeds, dim filtered borough != 'Unknown' BEFORE the left
    // joins (so rides into unknown zones survive with NULL borough), the
    // same dim joined twice under pickup/dropoff roles, payment decode.
    r.register(Model("AUX_TLC_RIDES", "2_STG___AUX_TLC",
        Seq("LOCATION_ID_TO_NEIGHBORHOOD"), View) { deps =>
      val facts = unionHarmonized(canonicalFact, Seq(
        SourceFeed("RIDES_YELLOW", feeds("RIDES_YELLOW"), yellowMap),
        SourceFeed("RIDES_GREEN", feeds("RIDES_GREEN"), greenMap),
        SourceFeed("RIDES_FHV", feeds("RIDES_FHV"), fhvMap),
        SourceFeed("RIDES_FHVHV", feeds("RIDES_FHVHV"), fhvhvMap)))
      // 263-row dim => automatic broadcast-hash join on any cluster.
      val dim = deps("LOCATION_ID_TO_NEIGHBORHOOD")
        .filter(col("borough") =!= "Unknown") // F1: null-rejecting !=
      val pu = dim.select(
        col("location_id").as("pu_location_id"),
        col("borough").as("pickup_borough"),
        col("neighborhood").as("pickup_neighborhood"))
      val doo = dim.select(
        col("location_id").as("do_location_id"),
        col("borough").as("dropoff_borough"),
        col("neighborhood").as("dropoff_neighborhood"))
      // Final select list mirrors AUX_TLC_RIDES.sql:41-69: 28 columns in
      // the reference's order, and the decoded label emitted AS
      // payment_type (string) — the raw code does not survive the view.
      facts
        .join(broadcast(pu), facts("pickup_location_id") === pu("pu_location_id"), "left")
        .join(broadcast(doo), facts("dropoff_location_id") === doo("do_location_id"), "left")
        .select(
          col("pickup_datetime"),
          col("dropoff_datetime"),
          col("pickup_location_id"),
          col("pickup_borough"),
          col("pickup_neighborhood"),
          col("dropoff_location_id"),
          col("dropoff_borough"),
          col("dropoff_neighborhood"),
          col("passenger_count"),
          col("trip_distance"),
          col("trip_type"),
          col("rate_code_id"),
          col("fare_amount"),
          col("tip_amount"),
          col("tolls_amount"),
          col("airport_fee"),
          col("ehail_fee"),
          col("congestion_surcharge"),
          col("improvement_surcharge"),
          col("mta_tax"),
          col("extra"),
          col("total_amount"),
          tlcPaymentType(col("payment_type")).as("payment_type"),
          col("store_and_fwd_flag"),
          col("sr_flag"),
          col("vendor_id"),
          col("dispatching_base_num"),
          col("affiliated_base_number"))
    })
    r
  }
}
