package graft

import graft.pipeline.DataTests
import graft.pipeline.DataTests.Check
import org.apache.spark.sql.functions._

class DataTestsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val zones = Seq(
    (1L, "Bronx", "A"), (2L, "Queens", "B"), (3L, null, "A"), (3L, "EWR", "Z"))
    .toDF("location_id", "borough", "svc")

  test("notNull: surfaces exactly the null rows") {
    val v = DataTests.notNull(zones, "borough").collect()
    assert(v.length == 1 && v.head.getLong(0) == 3L)
  }

  test("unique: duplicate keys reported with counts; composite keys supported") {
    val v = DataTests.unique(zones, Seq("location_id")).collect()
    assert(v.length == 1 && v.head.getLong(0) == 3L && v.head.getLong(1) == 2L)
    assert(DataTests.unique(zones, Seq("location_id", "svc")).count() == 0)
  }

  test("unique: NULL keys excluded before grouping (dbt semantics)") {
    val df = Seq(Option("a"), None, None).toSeq.toDF("k")
    // two NULL rows are NOT a duplicate pair under dbt's unique test
    assert(DataTests.unique(df, Seq("k")).count() == 0)
  }

  test("acceptedValues: out-of-domain flagged, NULL tolerated (dbt semantics)") {
    val v = DataTests.acceptedValues(zones, "borough",
      Seq("Bronx", "Queens", "Brooklyn", "Manhattan", "Staten Island"))
      .collect()
    assert(v.length == 1 && v.head.getString(1) == "EWR")
  }

  test("relationships: orphan foreign keys found via anti-join; NULL FK tolerated") {
    val rides = Seq(
      (10L, java.lang.Long.valueOf(1L)), (11L, java.lang.Long.valueOf(99L)),
      (12L, null.asInstanceOf[java.lang.Long]))
      .toDF("ride_id", "pickup_location_id")
    val v = DataTests.relationships(rides, "pickup_location_id", zones, "location_id")
      .collect()
    assert(v.length == 1 && v.head.getLong(0) == 11L)
  }

  test("expect: predicate violations include NULL-predicate rows") {
    val df = Seq(Some(5.0), Some(-1.0), None).toSeq.toDF("fare")
    // expectation fare >= 0: -1 fails, NULL predicate counts as failure
    assert(DataTests.expect(df, col("fare") >= 0).count() == 2)
  }

  test("runAll: reports every check; failFast stops at first failure") {
    val suite = Seq(
      Check("zones", "unique_location_id", DataTests.unique(zones, Seq("location_id"))),
      Check("zones", "not_null_borough", DataTests.notNull(zones, "borough")))
    val all = DataTests.runAll(suite)
    assert(all.map(_.nViolations) == Seq(1L, 1L) && all.forall(!_.passed))
    assert(DataTests.runAll(suite, failFast = true).length == 1)
  }
}
