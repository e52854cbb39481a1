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

  test("streamed frozen IVF-PQ code serving: cell-partitioned upsert == batch encode; probes prune") {
    import graft.operators.{KMeans, Similarity}
    val emb = spark.read.parquet(src)
    val cells = KMeans.fit(emb, "embedding", "vec_id", k = 16, dim = 64)
    val pqCb = KMeans.fitPqCodebook(
      Similarity.cellResiduals(emb, "embedding", "vec_id", cells.centroids),
      "rv", "id", m = 4, kCent = 16, dim = 64)
    // the e12 encode chain — assignment + residual + PQ encode, three
    // frozen-literal-codebook map-only calls, identical batch or stream
    def encode(df: org.apache.spark.sql.DataFrame) =
      Similarity.cellResiduals(df, "embedding", "vec_id", cells.centroids)
        .select(col("id"), col("cell"),
          graft.expressions.VectorExpressions.pqEncode(col("rv"), pqCb, 4)
            .as("st"))
        .filter(col("st").isNotNull)
        .select(col("id"), col("cell"), col("st.codes").as("codes"))
    val dir = Files.createTempDirectory("graft-stream-codes")
    Files.copy(Paths.get(src), dir.resolve("emb.parquet"))
    val schema = spark.read.parquet(src).schema
    val out = dir.resolve("codes").toString
    EventStreams.upsertStream(spark,
      encode(spark.readStream.schema(schema).parquet(dir.toString)),
      out, uniqueKey = Seq("id", "cell"), outputMode = "append",
      partitionBy = Seq("cell"))

    def rel(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).mkString(","))).sortBy(_._1).toSeq
    // partition-dir columns read back type-inferred (int) — normalize
    val stored = rel(spark.read.parquet(out)
      .select(col("id"), col("cell").cast("long").as("cell"), col("codes")))
    val batch = rel(encode(emb))
    assert(stored.size == 500 && stored == batch,
      "streamed code table must equal the batch encode")
    // the at-scale contract: a probe reads ONLY its cells' partitions
    val probed = spark.read.parquet(out).filter(col("cell").isin(0L, 1L))
    val scanned = probed.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }
    assert(scanned.contains(2), s"expected 2 cell dirs scanned, got $scanned")
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
