package graft

import graft.operators.TextAnalysis
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming CMS maintenance ([[EventStreams.cmsStreamQuery]]): after a
  * drain over micro-batched document drops, the state table must equal
  * the batch sketch of the drained corpus exactly (the merge law), and a
  * replayed batch must not double any counter. */
class StreamingCmsSpec extends SparkSpec {
  import spark.implicits._

  private def sketchMap(df: org.apache.spark.sql.DataFrame) =
    df.select("r", "bucket", "c").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("drained state == batch sketch of the union corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val in = Files.createTempDirectory("graft-cms-in")
    // two crawl drops, one file each
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(in.toString + "/drop1")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(in.toString + "/drop2")
    val state = Files.createTempDirectory("graft-cms-state").toString + "/cms"
    val schema = docs.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in.toString + "/*")
    val q = EventStreams.cmsStreamQuery(spark, stream, "text", state)
    q.awaitTermination()
    val got = sketchMap(spark.read.parquet(state))
    val want = sketchMap(TextAnalysis.cmsSketch(docs, "text", 4, 512))
    assert(got == want, s"state ${got.size} cells vs batch ${want.size}")
  }

  test("an already-committed batch id is skipped, counters not doubled") {
    val docs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val in = Files.createTempDirectory("graft-cms-rep")
    docs.coalesce(1).write.parquet(in.toString + "/drop1")
    val state = Files.createTempDirectory("graft-cms-rep-state")
      .toString + "/cms"
    val schema = docs.schema
    val s1 = spark.readStream.schema(schema).parquet(in.toString + "/*")
    EventStreams.cmsStreamQuery(spark, s1, "text", state).awaitTermination()
    val once = sketchMap(spark.read.parquet(state))
    // at-least-once replay: the SAME batch (id 0) delivered again to the
    // guarded fold — a fresh checkpoint restarts batch ids, so only the
    // last_batch-in-state guard stands between the replay and a double
    // count
    EventStreams.cmsFoldBatch(spark, docs, 0L, "text", state, 4, 512)
    assert(sketchMap(spark.read.parquet(state)) == once,
      "replayed batch id must be skipped by the state guard")
    // a genuinely NEW batch still folds
    EventStreams.cmsFoldBatch(spark,
      Seq((2L, "alpha")).toDF("doc_id", "text"), 1L, "text", state, 4, 512)
    assert(sketchMap(spark.read.parquet(state)) != once)
    // a batch id BELOW last_batch is not a replay — it means the
    // checkpoint was reset while the state survived (ids restarted at
    // 0), and every fold would silently no-op forever: fail loud instead
    val e = intercept[IllegalStateException] {
      EventStreams.cmsFoldBatch(spark,
        Seq((3L, "beta")).toDF("doc_id", "text"), 0L, "text", state, 4, 512)
    }
    assert(e.getMessage.contains("checkpoint"))
  }
}
