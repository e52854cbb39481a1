package graft

import graft.streaming.{EventStreams, StreamingMetrics}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Lateness observability ([[StreamingMetrics]]): late events driven
  * through the stateful streaming operators must surface as
  * `late_rows_dropped` rows in the metrics table, with the watermark
  * and its lag recorded per micro-batch — the numbers an operator
  * pages on, landed as a queryable warehouse table instead of a
  * transient progress object.
  *
  * Fixtures are THREE batches because of Spark's two-watermark
  * semantics (late-events filter = previous batch's committed
  * watermark; eviction = current): a row arriving one batch after the
  * sentinel that outran it is NOT yet late — the same row two batches
  * later is. The specs pin exactly that boundary so the metrics table
  * documents the engine's real contract, not a folk version of it. */
class StreamingMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
  private def ev(id: Long, user: Long, offsetSec: Long,
                 typ: String = "click", value: Double = 1.0) =
    (id, java.sql.Timestamp.from(base.plusSeconds(offsetSec)), user,
      typ, value, "{}")
  private val cols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Landing dir with one file per batch, distinct mod-times so the
    * file-source order is stable. */
  private def land(batches: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]*)
      : String = {
    val stage = Files.createTempDirectory("graft-met-stage").toString
    val dir = Files.createTempDirectory("graft-met-land").toString
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF(cols: _*).coalesce(1).write.parquet(s"$stage/f$i")
      val f = new java.io.File(s"$stage/f$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(dir, f"b$i%02d.parquet"))
      Thread.sleep(1100)
    }
    dir
  }

  private def streamOf(dir: String) =
    graft.catalog.Catalog.normalizeEventTs(spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir))

  test("session aggregation: a below-watermark event lands as late_rows_dropped") {
    val dir = land(
      Seq(ev(1, 7, 0), ev(2, 7, 300), ev(3, 99, 4 * 3600)), // sentinel: wm -> 03:50
      Seq(ev(4, 98, 4 * 3600 + 60)),                        // holds the wm committed
      Seq(ev(5, 8, 600)))                                   // ~4 h below it: late
    val metrics = Files.createTempDirectory("graft-met-t1").toString + "/m"
    val got = StreamingMetrics.runAvailableNowWithMetrics(spark,
      EventStreams.sessionWindowCounts(streamOf(dir)),
      "met_sessions", metrics)
    // the late event's session never materializes
    assert(!got.select("user_id").as[Long].collect().contains(8L))
    val m = spark.read.parquet(metrics)
    val dropped = m.agg(sum(col("late_rows_dropped"))).head().getLong(0)
    assert(dropped === 1L,
      s"exactly the one late event must be dropped-by-watermark:\n" +
        m.orderBy("batch_id").collect().mkString("\n"))
    // the batch that dropped it records the watermark it enforced
    val lateBatch = m.filter(col("late_rows_dropped") > 0).head()
    assert(lateBatch.getAs[java.sql.Timestamp]("watermark") != null)
    // watermark lag is measured whenever both sides exist
    assert(m.filter(col("watermark_lag_ms").isNotNull).count() > 0)
  }

  test("attribution join: a below-watermark click lands as late_rows_dropped") {
    val dir = land(
      // sentinels on BOTH sides in batch 0: the global watermark is the
      // min over the two event-time columns
      Seq(ev(1, 7, 0), ev(2, 7, 60, "purchase", 9.99),
        ev(3, 97, 4 * 3600), ev(4, 99, 4 * 3600, "purchase", 0.0)),
      Seq(ev(6, 96, 4 * 3600 + 60), ev(7, 95, 4 * 3600 + 60, "purchase", 0.0)),
      Seq(ev(5, 8, 0))) // click 4 h below the committed watermark: late
    val metrics = Files.createTempDirectory("graft-met-t2").toString + "/m"
    val got = StreamingMetrics.runAvailableNowWithMetrics(spark,
      EventStreams.attributionJoin(streamOf(dir)),
      "met_attr", metrics)
    // the in-horizon pair still flows; the late click never joins
    assert(got.select("purchase_id", "click_id").as[(Long, Long)]
      .collect().toSet === Set((2L, 1L)))
    val m = spark.read.parquet(metrics)
    val dropped = m.agg(sum(col("late_rows_dropped"))).head().getLong(0)
    assert(dropped >= 1L,
      s"the late click must be dropped-by-watermark:\n" +
        m.orderBy("batch_id").collect().mkString("\n"))
    assert(m.filter(col("operator").isNotNull).count() > 0,
      "join state operator rows must be present")
  }

  test("lateness gate: the data-test check fails on a dropping batch, passes under threshold") {
    val dir = land(
      Seq(ev(1, 7, 0), ev(2, 7, 300), ev(3, 99, 4 * 3600)),
      Seq(ev(4, 98, 4 * 3600 + 60)),
      Seq(ev(5, 8, 600)))
    val metrics = Files.createTempDirectory("graft-met-t4").toString + "/m"
    // a fresh pipeline's gate evaluates clean, it doesn't throw
    val fresh = graft.pipeline.DataTests.runAll(
      Seq(StreamingMetrics.latenessCheck(spark, metrics)))
    assert(fresh.forall(_.passed))
    StreamingMetrics.runAvailableNowWithMetrics(spark,
      EventStreams.sessionWindowCounts(streamOf(dir)),
      "met_gate", metrics)
    val strict = graft.pipeline.DataTests.runAll(
      Seq(StreamingMetrics.latenessCheck(spark, metrics)))
    assert(strict.exists(r => !r.passed && r.nViolations === 1L),
      s"the dropping batch must violate the zero-lateness gate: $strict")
    val tolerant = graft.pipeline.DataTests.runAll(
      Seq(StreamingMetrics.latenessCheck(spark, metrics, maxLate = 1L)))
    assert(tolerant.forall(_.passed))
  }

  test("stateless query still records per-batch input volume (NULL operator)") {
    val dir = land(Seq(ev(1, 7, 0)), Seq(ev(2, 8, 60)))
    val metrics = Files.createTempDirectory("graft-met-t3").toString + "/m"
    StreamingMetrics.runAvailableNowWithMetrics(spark,
      streamOf(dir).filter(col("event_type") === "click"),
      "met_stateless", metrics)
    val m = spark.read.parquet(metrics)
    assert(m.filter(col("operator").isNull).count() === m.count())
    assert(m.agg(sum(col("input_rows"))).head().getLong(0) === 2L)
  }
}
