package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The per-document curation gates are STATELESS map-only projections
  * (quality score, Gopher rules, repetition stats, PII redaction), so
  * the exact same expressions run unchanged on a readStream — this spec
  * pins that property: a streamed corpus filtered through the gates
  * yields the identical keeper set and redacted text as the batch path.
  * (The corpus-GLOBAL stages — dedup, decontamination — are batch by
  * design; CurationModels documents that split.)
  */
class StreamingCurationSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001/documents.parquet"

  /** The shared gate: ONE map-only projection reusing the same library
    * expressions as CurationModels' DOCS_PROFILED -> DOCS_FILTERED. */
  private def gate(df: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions._
    val rep = graft.expressions.TextExpressions.repetitionStats(col("text"))
    val gop = graft.expressions.TextExpressions.gopherStats(col("text"))
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
        qualityScore(col("text")).as("quality"),
        rep.as("rep"), gop.as("gop"),
        redactPii(col("text")).as("redacted"))
      .filter(col("quality") >= 0.5 &&
        (col("rep.n_tokens") === 0L ||
          (lit(1.0) - col("rep.n_distinct").cast("double") /
            col("rep.n_tokens").cast("double")) <= 0.9) &&
        (col("gop.n_tokens") === 0L ||
          col("gop.n_alpha_toks").cast("double") /
            col("gop.n_tokens").cast("double") >= 0.8))
      .select(col("doc_id"), col("redacted"))
  }

  test("streamed curation gate equals the batch gate (same keeper set, same text)") {
    val dir = Files.createTempDirectory("graft-stream-cur")
    Files.copy(Paths.get(src), dir.resolve("docs.parquet"))
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val streamed = EventStreams.runAvailableNow(spark, gate(stream), "cur_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val batch = gate(spark.read.parquet(src))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(streamed.nonEmpty, "gate keeps a nonempty subset at sf0.001")
    assert(streamed == batch,
      s"streamed gate must equal batch gate: ${streamed.size} vs ${batch.size}")
  }
}
