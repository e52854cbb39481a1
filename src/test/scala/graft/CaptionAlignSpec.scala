package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** [[Multimodal.captionAlign]] (m08) — the CLIP-score cross-modal gate:
  * pairs whose caption IS the payload text must score exactly 1.0 (the
  * two stub towers hash the same content), longer docs land in the
  * uncorrelated band, and the threshold classification is a pure
  * function of the ROUNDED cosine (the cross-engine contract). */
class CaptionAlignSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  private def docsDF(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))

  test("caption == payload scores exactly 1.0 and passes the gate") {
    val short = "a short caption-sized document"
    val long = ("x" * 90) + " tail well past the hundred-char caption " +
      ("y" * 60)
    val out = Multimodal.captionAlign(
        docsDF(Seq((0L, short), (3L, long))), capChars = 100)
      .orderBy("media_id").collect()
    assert(out.length == 2)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getDouble(1) == 1.0 && byId(0L).getBoolean(2),
      s"exact pair scored ${byId(0L).getDouble(1)}")
    assert(byId(3L).getDouble(1) < 1.0,
      "truncated caption cannot equal the full-payload embedding")
  }

  test("only image-kind docs with non-null text form pairs") {
    val out = Multimodal.captionAlign(docsDF(Seq(
        (0L, "image doc"), (1L, "audio doc"), (2L, "video doc"),
        (4L, "audio again"))))
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L),
      "non-image kinds must not pair")
  }

  test("real corpus: the gate splits inside the random band") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.captionAlign(docs, capChars = 100, tau = 0.8)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // classification is exactly rounded-cosine >= tau, per row
    assert(rows.forall(r => r.getBoolean(2) == (r.getDouble(1) >= 0.8)))
    assert(rows.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
    // measured corpus shape: both classes present (32 aligned / 135 not
    // at this SF) — the gate does real work, not a constant
    val aligned = rows.count(_.getBoolean(2))
    assert(aligned > 0 && aligned < rows.length,
      s"degenerate gate: $aligned of ${rows.length} aligned")
    // perfectly-aligned pairs (caption == whole text) all score 1.0
    val exact = docs.filter(col("text").isNotNull &&
        pmod(col("doc_id"), lit(3L)) === 0 && length(col("text")) <= 100)
      .select("doc_id").as[Long].collect().toSet
    val ones = rows.filter(r => exact.contains(r.getLong(0)))
    assert(ones.nonEmpty && ones.forall(_.getDouble(1) == 1.0),
      "every caption-fits-whole-doc pair must score exactly 1.0")
  }
}
