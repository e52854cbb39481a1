package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Native session_window streaming aggregation
  * ([[EventStreams.sessionWindowCounts]]): an AvailableNow drain in
  * append mode must emit exactly the batch session aggregation minus
  * the sessions still open at the final watermark, and a session split
  * across micro-batches must merge into one window. */
class StreamingSessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
  private def ev(id: Long, user: Long, offsetSec: Long) =
    (id, java.sql.Timestamp.from(base.plusSeconds(offsetSec)), user,
      "click", 1.0, "{}")
  private val cols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  test("drain == batch sessions, sentinel keeps only itself open") {
    val d = Files.createTempDirectory("graft-sw").toString
    // user 7: two sessions (gap > 30 min); user 8: one session;
    // sentinel user 99 two hours later pushes the watermark past
    // every earlier session's end — only its own session stays open
    val rows = Seq(
      ev(1, 7, 0), ev(2, 7, 600),          // session A: 0-10 min
      ev(3, 7, 4000), ev(4, 7, 4300),      // session B: 66-72 min
      ev(5, 8, 100), ev(6, 8, 1500),       // session C
      ev(7, 99, 4 * 3600)                  // sentinel, 4 h later
    )
    rows.toDF(cols: _*).coalesce(1).write.parquet(d + "/f1")
    val land = Files.createTempDirectory("graft-sw-land").toString
    val f = new java.io.File(d + "/f1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(f.toPath, java.nio.file.Paths.get(land, "b1.parquet"))

    val got = EventStreams.runAvailableNow(spark,
      EventStreams.sessionWindowCounts(
        EventStreams.readEvents(spark, land)),
      "sw_drain")
      .select("user_id", "session_start", "n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet

    val batch = graft.catalog.Catalog.normalizeEventTs(
        spark.read.parquet(land))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(batch.size == 4, s"expected 4 batch sessions: $batch")
    // the drain withholds exactly the sentinel's still-open session
    assert(got == batch.filterNot(_._1 == 99L),
      s"drain $got != closed batch sessions of $batch")
  }

  test("a session split across micro-batches merges into one window") {
    val d = Files.createTempDirectory("graft-sw2").toString
    Seq(ev(1, 7, 0), ev(2, 7, 300)).toDF(cols: _*)
      .coalesce(1).write.parquet(d + "/f1")
    // second file continues the SAME session (gap 5 min < 30) and adds
    // the watermark-advancing sentinel
    Seq(ev(3, 7, 600), ev(4, 99, 4 * 3600)).toDF(cols: _*)
      .coalesce(1).write.parquet(d + "/f2")
    val land = Files.createTempDirectory("graft-sw2-land").toString
    def move(sub: String, name: String): Unit = {
      val f = new java.io.File(d + "/" + sub).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(land, name))
    }
    move("f1", "b1.parquet"); move("f2", "b2.parquet")
    val stream = spark.readStream
      .schema(spark.read.parquet(land).schema)
      .option("maxFilesPerTrigger", "1").parquet(land)
    val got = EventStreams.runAvailableNow(spark,
      EventStreams.sessionWindowCounts(
        graft.catalog.Catalog.normalizeEventTs(stream)),
      "sw_split")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 3L)),
      s"split session must merge into one 3-event window: $got")
  }
}
