package graft

import graft.operators.TextAnalysis
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming data-card maintenance ([[EventStreams.dataCardStreamQuery]]):
  * draining batched document drops through the fingerprint-keyed state
  * fold must produce exactly the batch card — retroactive dup flips
  * across micro-batches included — and a counter fold must never
  * double-apply on replay. */
class StreamingDataCardSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
  private def docsOf(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF(cols: _*)

  private val drop1 = Seq(
    (1L, "alpha beta gamma", "en", "web"),
    (2L, "mail me at a@b.co", "en", "web"))
  private val drop2 = Seq(
    (3L, "alpha  beta gamma", "en", "books"), // retroactive dup of doc 1
    (4L, "quelque chose", "fr", "web"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("lang", "source", "n_docs", "n_tokens", "n_chars",
        "n_dup_docs", "n_pii_docs")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("drained drops == batch card; retroactive flip crosses micro-batches") {
    val land = Files.createTempDirectory("graft-dc-land").toString + "/in"
    docsOf(drop1).coalesce(1).write.parquet(land)
    docsOf(drop2).coalesce(1).write.mode("append").parquet(land)
    val state = Files.createTempDirectory("graft-dc-state").toString + "/card"
    val q = EventStreams.dataCardStreamQuery(spark,
      spark.readStream.schema(spark.read.parquet(land).schema)
        .option("maxFilesPerTrigger", "1").parquet(land),
      "text", "lang", "source", "n_chars", state)
    q.awaitTermination()
    val streamed = TextAnalysis.dataCardFromState(
      spark.read.parquet(state).drop("last_batch"))
    val batch = TextAnalysis.dataCardFromState(TextAnalysis.dataCardState(
      docsOf(drop1 ++ drop2), "text", "lang", "source", "n_chars"))
    assert(canon(streamed) === canon(batch))
    val m = canon(streamed).map(r => (r._1, r._2) -> r).toMap
    assert(m(("en", "web"))._6 === 1L, "doc 1 must flip to dup retroactively")
    assert(m(("en", "books"))._6 === 1L)
  }

  test("replay guard: equal batch id no-ops, lower fails loud") {
    val state = Files.createTempDirectory("graft-dc-state2").toString + "/card"
    val b = docsOf(drop1)
    EventStreams.dataCardFoldBatch(spark, b, 0L, "text", "lang", "source",
      "n_chars", state)
    val once = canon(TextAnalysis.dataCardFromState(
      spark.read.parquet(state).drop("last_batch")))
    // genuine replay (restart before checkpoint commit): silently skipped
    EventStreams.dataCardFoldBatch(spark, b, 0L, "text", "lang", "source",
      "n_chars", state)
    assert(canon(TextAnalysis.dataCardFromState(
      spark.read.parquet(state).drop("last_batch"))) === once,
      "a counter fold must not double-apply")
    // advance, then a LOWER id = reset checkpoint over surviving state
    EventStreams.dataCardFoldBatch(spark, docsOf(drop2), 1L, "text", "lang",
      "source", "n_chars", state)
    val e = intercept[IllegalStateException] {
      EventStreams.dataCardFoldBatch(spark, b, 0L, "text", "lang", "source",
        "n_chars", state)
    }
    assert(e.getMessage.contains("checkpoint was reset"))
  }
}
