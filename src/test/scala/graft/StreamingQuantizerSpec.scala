package graft

import graft.operators.KMeans
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The round-7 serving-side operators are STATELESS map-only
  * projections — trained-cell assignment is one compiled call against a
  * driver-literal codebook ([[graft.expressions.NearestCellExpr]]) and
  * split assignment a pure hash CASE — so the exact same expressions
  * run unchanged on a readStream. This is the production shape for a
  * TRAINED quantizer: fit offline (batch, driver-orchestrated), then
  * score every arriving embedding micro-batch with the frozen codebook;
  * the fit itself is deliberately NOT streamable (iterative, corpus-
  * global — the same batch-by-design split CurationModels documents for
  * dedup). */
class StreamingQuantizerSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001/embeddings.parquet"

  test("streamed trained-cell assignment equals the batch assignment") {
    val model = KMeans.fit(spark.read.parquet(src),
      "embedding", "vec_id", k = 16, dim = 64)
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), graft.expressions.VectorExpressions
        .nearestCell(col("embedding").cast("array<double>"),
          model.centroids, model.cellIds).as("cell"))
    val dir = Files.createTempDirectory("graft-stream-cells")
    Files.copy(Paths.get(src), dir.resolve("emb.parquet"))
    val schema = spark.read.parquet(src).schema
    val streamed = EventStreams.runAvailableNow(spark,
        assign(spark.readStream.schema(schema).parquet(dir.toString)),
        "cells_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val batch = assign(spark.read.parquet(src))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(streamed.size == 500 && streamed == batch)
  }

  test("streamed holdout-split assignment equals the batch assignment") {
    val splits = Seq("train" -> 98, "val" -> 1, "test" -> 1)
    def assign(df: org.apache.spark.sql.DataFrame) =
      graft.io.Export.assignSplits(df.select(col("vec_id")), "vec_id", splits)
    val dir = Files.createTempDirectory("graft-stream-split")
    Files.copy(Paths.get(src), dir.resolve("emb.parquet"))
    val schema = spark.read.parquet(src).schema
    val streamed = EventStreams.runAvailableNow(spark,
        assign(spark.readStream.schema(schema).parquet(dir.toString)),
        "split_out")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val batch = assign(spark.read.parquet(src))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(streamed.size == 500 && streamed == batch)
  }
}
