package graft

import graft.queries.{CoreQueries, DataQueries, ExtQueries, MediaQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory: core relational surface
  * (graft.queries.CoreQueries — SURVEY.md §2 line by line) plus the
  * training-data pipeline surface (graft.queries.DataQueries — dedup /
  * similarity / text analysis). `oracleSql` carries a DuckDB twin for
  * EVERY query — since r9 the approximate operators (q16 KMV distinct,
  * q40 grid-rank percentile) are deterministic md5/grid sketches whose
  * estimates replay exactly, so no rows-only entries remain.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's signature shape: filtered dim, same dim left-joined
    * twice onto a fact, aggregation on top (SURVEY.md §2.3-2.4). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03DimDoubleJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ ExtQueries.all ++ DataQueries.all ++ MediaQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ExtQueries.oracles ++ DataQueries.oracles ++
      MediaQueries.oracles
}
