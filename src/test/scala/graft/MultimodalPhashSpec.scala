package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Media perceptual-hash near-dup ([[Multimodal.phashNearDup]] /
  * [[graft.expressions.PerceptualHashExpr]]): localized content noise
  * must pair, length-changing edits must NOT (the aHash alignment
  * contract — cropping defeats image aHash the same way), distinct
  * payloads must stay far, and empty payloads must never pair. */
class MultimodalPhashSpec extends SparkSpec {
  import spark.implicits._

  private def mediaOf(rows: Seq[(Long, String)]) = {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    Multimodal.fromDocuments(rows
      .map { case (id, t) => (id, t, "en", "src") }
      .toDF("doc_id", "text", "lang", "source"))
  }

  private val base =
    "The quick brown fox jumps over the lazy dog 0123456789. " * 20

  test("a localized substitution pairs; an appended suffix does not") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val sub = base.updated(base.length / 2, 'X')
    val suffixed = base + " re-encode pass trailer padding"
    val got = Multimodal.phashNearDup(mediaOf(Seq(
        1L -> base, 2L -> sub, 3L -> suffixed)))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"substitution must pair: $got")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      s"length-changing edit shifts every segment boundary: $got")
  }

  test("structurally different payloads do not pair") {
    val other = ("zzzz    AAAA" * 50) + ("0000????" * 40)
    val got = Multimodal.phashNearDup(mediaOf(Seq(1L -> base, 9L -> other)))
      .count()
    assert(got === 0L)
  }

  test("empty payloads never pair (NULL signature)") {
    val got = Multimodal.phashNearDup(mediaOf(Seq(
        1L -> "", 2L -> "", 3L -> base)))
      .count()
    assert(got === 0L)
  }

  test("signature is deterministic and partition-invariant") {
    val rows = (1L to 50L).map(i => i -> (base + i))
    def run(parts: Int) = {
      implicit val sp: org.apache.spark.sql.SparkSession = spark
      Multimodal.fromDocuments(rows
          .map { case (id, t) => (id, t, "en", "src") }
          .toDF("doc_id", "text", "lang", "source").repartition(parts))
        .toDF().select(col("media_id"),
          graft.expressions.HashExpressions.phash(
            decode(col("bytes"), "UTF-8")).as("sig"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(run(1) === run(7))
  }
}
