package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class StreamingDedupSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001/events.parquet"

  // a landing dir where the same file arrives TWICE (duplicate delivery)
  private lazy val dupDir: String = {
    val d = Files.createTempDirectory("graft-dup")
    Files.copy(Paths.get(src), d.resolve("delivery-1.parquet"))
    Files.copy(Paths.get(src), d.resolve("delivery-2.parquet"))
    d.toString
  }

  test("streaming dedup drops redelivered events within the watermark") {
    val stream = EventStreams.readEvents(spark, dupDir)
    val deduped = EventStreams.dedupEvents(stream, "14 days")
    val got = EventStreams.runAvailableNow(spark, deduped.toDF(), "dedup_out")
    val distinctIds = graft.catalog.Catalog(spark, "/root/testdata/sf0.001")
      .events.select("event_id").distinct().count()
    assert(got.count() == distinctIds,
      s"double-delivered stream dedups to the distinct id count ($distinctIds)")
  }

  test("streaming harmonized union matches the batch feed counts") {
    val stream = EventStreams.readEvents(spark, dupDir)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.harmonizedUnion(stream), "harm_out")
    val batch = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").events
    val nClick = batch.filter(col("event_type") === "click").count()
    val nSignup = batch.filter(col("event_type") === "signup").count()
    // x2: harmonization is map-only, so the duplicate delivery passes through
    assert(got.filter(col("kind") === "click").count() == 2 * nClick)
    assert(got.filter(col("kind") === "signup").count() == 2 * nSignup)
    assert(got.filter(col("kind") === "click" && col("amount").isNull).count() == 0)
  }
}
