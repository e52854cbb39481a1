package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming upsert into the warehouse: foreachBatch merging each
  * micro-batch with the batch DAG's Incremental delete+insert semantics. */
class StreamingUpsertSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001/events.parquet"

  // duplicate delivery: the same file lands twice
  private def dupDir(): String = {
    val d = Files.createTempDirectory("graft-ups")
    Files.copy(Paths.get(src), d.resolve("delivery-1.parquet"))
    Files.copy(Paths.get(src), d.resolve("delivery-2.parquet"))
    d.toString
  }

  test("keyed fact stream: a later redelivery converges to one row per key") {
    // two cron-tick drains over the same checkpoint: delivery-2 (the
    // same content under a new name) arrives BETWEEN runs, so the
    // second drain's increment redelivers every key and the merge
    // replaces instead of appending. (Within ONE increment the merge
    // is dbt's delete+insert: it assumes the increment is key-unique
    // and does not dedup it — cross-batch convergence is the contract.)
    val d = Files.createTempDirectory("graft-ups").toString
    val out = Files.createTempDirectory("graft-ups-out").toString + "/events"
    def drain(): Unit = EventStreams.upsertStream(spark,
      EventStreams.readEvents(spark, d)
        .select("event_id", "ts", "event_type", "value"),
      out, uniqueKey = Seq("event_id"), outputMode = "append")

    Files.copy(Paths.get(src), Paths.get(d, "delivery-1.parquet"))
    drain()
    val n1 = spark.read.parquet(out).count()
    Files.copy(Paths.get(src), Paths.get(d, "delivery-2.parquet"))
    drain()
    val batch = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").events
    val distinctIds = batch.select("event_id").distinct().count()
    assert(n1 == distinctIds, "first drain lands every key once")
    assert(spark.read.parquet(out).count() == distinctIds,
      "redelivered keys are replaced, not appended")
  }

  test("aggregate stream in update mode: merged relation equals the batch aggregate") {
    val out = Files.createTempDirectory("graft-ups-out").toString + "/agg"
    val d = dupDir()
    val agg = EventStreams.windowedTypeCounts(EventStreams.readEvents(spark, d))
    EventStreams.upsertStream(spark, agg, out,
      uniqueKey = Seq("window_start", "event_type"), outputMode = "update")

    // batch twin over the SAME doubled input
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.catalog.Catalog.normalizeEventTs(spark.read.parquet(d))
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

    // round the float sum before set-compare: double addition order is
    // partitioning-dependent, bit-exact equality is not the contract
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("window_start"), col("event_type"), col("n_events"),
        round(col("sum_value"), 3).as("sum_value"))
    val got = norm(spark.read.parquet(out))
    val want = norm(batch)
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "upserted relation == batch aggregate of the same input")
  }

  test("replaying the same increment is idempotent") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ups-out").toString + "/idem"
    val inc = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    graft.pipeline.Pipeline.mergeIntoParquet(spark, out, inc, Seq("k"))
    graft.pipeline.Pipeline.mergeIntoParquet(spark, out, inc, Seq("k"))
    assert(spark.read.parquet(out).count() == 2,
      "at-least-once replay converges to the same relation")
  }

  test("versioned upsert stream: each drain commits a version; pinned readers stay consistent") {
    import graft.pipeline.VersionedTable
    val root = Files.createTempDirectory("graft-ups-out").toString + "/vtbl"
    val d = Files.createTempDirectory("graft-ups-in").toString
    def drain(): Unit = EventStreams.versionedUpsertStreamQuery(spark,
      EventStreams.readEvents(spark, d)
        .select("event_id", "ts", "event_type", "value"),
      root, uniqueKey = Seq("event_id"), outputMode = "append")
      .awaitTermination()

    Files.copy(Paths.get(src), Paths.get(d, "delivery-1.parquet"))
    drain()
    val v1 = VersionedTable.currentVersion(spark, root).get
    val n1 = VersionedTable.read(spark, root).count()
    // pin a reader to the current version BEFORE the next drain
    val pinned = VersionedTable.read(spark, root)
    // redelivery between ticks: same keys again -> content converges,
    // version advances (the no-transient-miss upgrade over plain dirs)
    Files.copy(Paths.get(src), Paths.get(d, "delivery-2.parquet"))
    drain()
    assert(VersionedTable.currentVersion(spark, root).get > v1)
    assert(VersionedTable.read(spark, root).count() === n1,
      "redelivered keys replaced, not appended")
    // the pinned reader still collects its version, mid-"swap" safe
    assert(pinned.count() === n1)
    // time travel back to the first drain's state
    assert(VersionedTable.readVersion(spark, root, v1).count() === n1)
  }

  test("merge heals a swap that crashed between its two renames") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ups-out").toString + "/crash"
    val inc1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    graft.pipeline.Pipeline.mergeIntoParquet(spark, out, inc1, Seq("k"))
    // simulate the crash window: live moved aside, replacement never
    // landed — the state an at-least-once replay walks into
    val f = new java.io.File(out)
    val aside = new java.io.File(out + ".__incremental_old")
    assert(f.renameTo(aside))
    val inc2 = Seq((2L, "b2"), (3L, "c")).toDF("k", "v")
    graft.pipeline.Pipeline.mergeIntoParquet(spark, out, inc2, Seq("k"))
    val rows = spark.read.parquet(out).orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "a"), (2L, "b2"), (3L, "c")),
      "history restored from the aside copy, then merged — NOT truncated " +
        "to the increment")
    assert(!aside.exists(), "aside copy cleaned up after the healed swap")
  }
}
