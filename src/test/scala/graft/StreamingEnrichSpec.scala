package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-static enrichment ([[EventStreams.enrichFromDim]]): the dim
  * is re-resolved per micro-batch, so a dimension rewrite between
  * drains must be visible to later batches — the slowly-changing-
  * dimension contract; and unmatched keys survive as null-padded rows
  * (left outer). */
class StreamingEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("dim rewrite between drains enriches later batches with new rows") {
    val land = Files.createTempDirectory("graft-enr-land").toString
    val dim = Files.createTempDirectory("graft-enr-dim").toString + "/d"
    val outPath = Files.createTempDirectory("graft-enr-out").toString + "/o"
    val cp = Files.createTempDirectory("graft-enr-cp").toString

    def writeDim(rows: Seq[(Long, String)]): Unit =
      rows.toDF("dim_user", "segment").write.mode("overwrite").parquet(dim)
    def land1(name: String, rows: Seq[(Long, Long)]): Unit = {
      val d = Files.createTempDirectory("graft-enr-stg")
      rows.toDF("event_id", "user_id").coalesce(1)
        .write.parquet(d.toString + "/f")
      val f = new java.io.File(d.toString + "/f").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, java.nio.file.Paths.get(land, name))
    }
    def drain(): Unit = {
      val stream = spark.readStream
        .schema("event_id LONG, user_id LONG").parquet(land)
      val q = EventStreams.enrichFromDim(spark, stream, dim,
          "user_id", "dim_user")
        .select(col("event_id"), col("user_id"), col("segment"))
        .writeStream.format("parquet").option("path", outPath)
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeDim(Seq(7L -> "bronze"))
    land1("b1.parquet", Seq(1L -> 7L, 2L -> 8L)) // 8 unmatched
    drain()
    // the dimension CHANGES between drains: 7 upgraded, 8 now known
    writeDim(Seq(7L -> "gold", 8L -> "silver"))
    land1("b2.parquet", Seq(3L -> 7L, 4L -> 8L))
    drain()
    val got = spark.read.parquet(outPath)
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(2)).getOrElse("-"))
      .toMap
    assert(got == Map(1L -> "bronze", 2L -> "-",
      3L -> "gold", 4L -> "silver"),
      s"batch 1 saw the old dim, batch 2 the rewritten one: $got")
  }
}
