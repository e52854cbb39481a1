package graft

import graft.catalog.Catalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The catalog-wide read-schema drift contract ([[Catalog.conform]]):
  * the r9 incident was the generator flipping events.ts from
  * TIMESTAMP(NANOS) to timestamp[us] and three queries dying with a
  * `-1.0` driver row each. The contract's promise — proven here with
  * type-flipped fixture files — is that every KNOWN-BENIGN re-encoding
  * (timestamp precision/NTZ, integer widths, float→double widenings) is
  * absorbed silently into ONE canonical schema, and every other drift
  * fails LOUD at first read with a per-column diff naming the table,
  * the column, and both types. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  /** A temp sf-shaped dir holding one flipped table. */
  private def fixtureDir(): String =
    Files.createTempDirectory("graft-drift").toString

  test("events.ts as raw int64 nanos normalizes to the same micros " +
      "timestamps as the current timestamp[us] spelling") {
    // canonical micros through the contract, whatever the current
    // testdata generation spells ts as
    val canon = Catalog(spark, "/root/testdata/sf0.001").events
    val dirA = fixtureDir()
    // the legacy generation: after the nanosAsLong read, TIMESTAMP(NANOS)
    // surfaces as a raw long — write that read-side shape directly
    canon.withColumn("ts", unix_micros(col("ts")) * 1000)
      .write.parquet(s"$dirA/events.parquet")
    val got = Catalog(spark, dirA).events
    assert(got.schema("ts").dataType == TimestampType)
    val want = canon.select("event_id", "ts").orderBy("event_id")
      .collect().toSeq
    val have = got.select("event_id", "ts").orderBy("event_id")
      .collect().toSeq
    assert(have == want)
  }

  test("benign integer-width drift (documents.n_chars int32) widens " +
      "to the canonical long silently") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .write.parquet(s"$dir/documents.parquet")
    val got = Catalog(spark, dir).documents
    assert(got.schema("n_chars").dataType == LongType)
    assert(got.count() > 0)
  }

  test("benign narrowing (embeddings.label int64) ANSI-casts back to " +
      "the canonical int when values fit") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("label", col("label").cast(LongType))
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Catalog(spark, dir).embeddings
    assert(got.schema("label").dataType == IntegerType)
    assert(got.count() > 0)
  }

  test("timestamp TZ/NTZ drift on orders.o_orderdate is absorbed") {
    val dir = fixtureDir()
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.withColumn("o_orderdate", col("o_orderdate").cast(TimestampType))
      .write.option("parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .parquet(s"$dir/orders.parquet")
    val got = Catalog(spark, dir).orders
    assert(got.schema("o_orderdate").dataType == TimestampNTZType)
    // UTC session contract: the stored micros are value-identical
    val want = orders.select(col("o_orderkey"),
      col("o_orderdate").cast(StringType)).orderBy("o_orderkey").collect().toSeq
    val have = got.select(col("o_orderkey"),
      col("o_orderdate").cast(StringType)).orderBy("o_orderkey").collect().toSeq
    assert(have == want)
  }

  test("additive evolution: an extra column passes through untouched") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("crawl_batch", lit(7L))
      .write.parquet(s"$dir/documents.parquet")
    val got = Catalog(spark, dir).documents
    assert(got.columns.contains("crawl_batch"))
    assert(got.schema("n_chars").dataType == LongType)
  }

  test("semantic drift (documents.n_chars as string) fails loud with " +
      "a per-column diff") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast(StringType))
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Catalog(spark, dir).documents)
    assert(e.getMessage.contains("documents"))
    assert(e.getMessage.contains("n_chars"))
    assert(e.getMessage.contains("STRING"))
  }

  test("lossy re-encoding (embeddings as array<double>) fails loud — " +
      "double->float would change values") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException](Catalog(spark, dir).embeddings)
    assert(e.getMessage.contains("embedding"))
  }

  test("a missing contract column fails loud naming the column") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .drop("props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Catalog(spark, dir).events)
    assert(e.getMessage.contains("props") && e.getMessage.contains("MISSING"))
  }

  test("multiple drifted columns surface in ONE diff, not one per read") {
    val dir = fixtureDir()
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("n_chars", col("n_chars").cast(StringType))
      .drop("source")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException](Catalog(spark, dir).documents)
    assert(e.getMessage.contains("n_chars") && e.getMessage.contains("source"))
    assert(e.getMessage.contains("2 column(s)"))
  }

  test("the current testdata conforms with a no-op plan (no extra " +
      "projection on an exact schema match)") {
    val df = Catalog(spark, "/root/testdata/sf0.001").documents
    // conform returns the raw reader plan unchanged on exact match
    assert(df.queryExecution.analyzed.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }.isEmpty, "exact-match conform must not inject a Project")
  }
}
