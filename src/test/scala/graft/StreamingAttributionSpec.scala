package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Stream-stream interval join ([[EventStreams.attributionJoin]]): an
  * AvailableNow drain over the file source must produce exactly the
  * batch interval join of the same input — inner-join emission does not
  * depend on watermark progress — including across a micro-batch split
  * (click and purchase arriving in different batches). */
class StreamingAttributionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def batchTwin(d: String) = {
    val ev = graft.catalog.Catalog.normalizeEventTs(spark.read.parquet(d))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value").as("amount"))
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 minutes"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("amount"))
  }

  test("drained stream join == batch interval join on real events") {
    val d = Files.createTempDirectory("graft-attr").toString
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(d, "events-1.parquet"))
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.attributionJoin(EventStreams.readEvents(spark, d)),
      "attr_join")
    val want = batchTwin(d)
    assert(got.count() > 0, "fixture must produce in-horizon pairs")
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "streaming drain must equal the batch interval join")
  }

  test("pairs split across micro-batches still match") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-attr2").toString
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ev(id: Long, tp: String, user: Long, offsetSec: Long) =
      (id, java.sql.Timestamp.from(base.plusSeconds(offsetSec)), user, tp, 1.5, "{}")
    // batch file 1: clicks; batch file 2: purchases 5 min later (inside
    // horizon) and 20 min later (outside) — maxFilesPerTrigger=8 means
    // separate FILES can still land in one trigger, so force the split
    // with two drains over one checkpoint? AvailableNow drains both
    // files; the join buffers click state across batches either way.
    Seq(ev(1, "click", 7, 0), ev(2, "click", 8, 0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(d + "/f1")
    Seq(ev(3, "purchase", 7, 300), ev(4, "purchase", 8, 1200))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(d + "/f2")
    val land = Files.createTempDirectory("graft-attr2-land").toString
    def move(sub: String, name: String): Unit = {
      val f = new java.io.File(d + "/" + sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, Paths.get(land, name))
    }
    move("f1", "b1.parquet"); move("f2", "b2.parquet")
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.attributionJoin(EventStreams.readEvents(spark, land)),
      "attr_join_split")
      .select("user_id", "purchase_id", "click_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((7L, 3L, 1L)),
      s"only the in-horizon pair attributes: $got")
  }

  test("left outer: unattributed purchases surface once the watermark closes them") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-attr3").toString
    val base = java.time.Instant.parse("2024-02-01T00:00:00Z")
    def ev(id: Long, tp: String, user: Long, offsetSec: Long) =
      (id, java.sql.Timestamp.from(base.plusSeconds(offsetSec)), user, tp, 2.5, "{}")
    // outer-join nulls only emit in a micro-batch AFTER the watermark
    // passes the join window — land the sentinel as its own second
    // batch (maxFilesPerTrigger=1) so the watermark advances and the
    // trailing no-data flush batch can evict + emit the null row
    Seq(
      ev(1, "click", 7, 0),
      ev(2, "purchase", 7, 300),    // attributed (click 5 min before)
      ev(3, "purchase", 8, 300)     // NO click for user 8 -> null row
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(d + "/f1")
    // the GLOBAL watermark is the MIN across both sides' event-time
    // columns, so the sentinel must advance clicks AND purchases — an
    // attributed far-future pair does both
    Seq(ev(4, "click", 99, 6 * 3600 - 60), ev(5, "purchase", 99, 6 * 3600))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(d + "/f2")
    val land = Files.createTempDirectory("graft-attr3-land").toString
    def move(sub: String, name: String): Unit = {
      val f = new java.io.File(d + "/" + sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(land, name))
    }
    move("f1", "b1.parquet")
    // two cron-tick drains over ONE checkpoint (the upsertStream
    // operational shape): drain 1 buffers the unmatched purchase —
    // its join window is still open; the sentinel lands between runs,
    // and drain 2 starts from the PERSISTED watermark it advanced, so
    // the eviction emits the null-padded row
    val out = Files.createTempDirectory("graft-attr3-out").toString + "/t"
    val cp = Files.createTempDirectory("graft-attr3-cp").toString
    def drain(): Unit = {
      val stream = graft.catalog.Catalog.normalizeEventTs(
        spark.readStream.schema(spark.read.parquet(land).schema)
          .parquet(land))
      val q = EventStreams.attributionJoinOuter(stream).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    move("f2", "b2.parquet")
    drain()
    // a batch only applies the PREVIOUSLY-persisted watermark, and an
    // empty backlog runs no batch at all — so a third drop (another
    // far-future click) drives the batch that evicts under the
    // sentinel-advanced watermark and emits the null row
    Seq(ev(6, "click", 98, 7 * 3600 - 60), ev(7, "purchase", 98, 7 * 3600))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(d + "/f3")
    move("f3", "b3.parquet")
    drain()
    val got = spark.read.parquet(out)
      .select(col("user_id"), col("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .as[(Long, Long, Long)].collect().toSet
    // (7,2,1): attributed in batch 1. (99,5,4)/(98,7,6): the sentinel
    // pairs, matched inner-style on arrival. (8,3,-1): the unmatched
    // purchase, null-emitted once the watermark passed its window.
    assert(got == Set((7L, 2L, 1L), (8L, 3L, -1L), (99L, 5L, 4L),
      (98L, 7L, 6L)),
      s"expected attributed + sentinel pairs + one null-padded: $got")
  }
}
