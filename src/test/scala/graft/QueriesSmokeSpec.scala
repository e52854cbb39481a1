package graft

/** Smoke over the full driver surface at sf0.001: every query plans and
  * returns rows (full value-level verification is the DuckDB oracle gate,
  * driven by graft.Verify). */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, dir).count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is a documented rows-only check") {
    // q16/q40: engine-specific sketches (HLL, quantile); m02: stub LCG
    // decode features
    val rowsOnly = Set("q16_approx_distinct", "q40_approx_percentile",
      "m02_media_features")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
