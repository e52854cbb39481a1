package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Incremental data card ([[TextAnalysis.dataCardState]] /
  * [[TextAnalysis.mergeDataCardState]] / [[TextAnalysis.dataCardFromState]]):
  * folding batches through the fingerprint-keyed state must equal the
  * batch rebuild — INCLUDING the retroactive dup flip, where a later
  * batch's copy of an old document turns the original into a duplicate
  * without rescanning it. */
class DataCardDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
  private def docsOf(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF(cols: _*)

  private val b1 = docsOf(Seq(
    (1L, "alpha beta gamma", "en", "web"),
    (2L, "contact me at user@example.com now", "en", "web"),
    (3L, "un document en francais", "fr", "web")))
  private val b2 = docsOf(Seq(
    (4L, "alpha  beta\tgamma", "en", "books"), // normalizes to doc 1's fp
    (5L, "another english doc", "en", "web")))
  private val b3 = docsOf(Seq(
    (6L, "un document en francais", "fr", "crawl"))) // dup of doc 3

  private def state(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.dataCardState(df, "text", "lang", "source", "n_chars")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("lang", "source", "n_docs", "n_tokens", "n_chars",
        "n_dup_docs", "n_pii_docs")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("three folded batches == batch rebuild, retroactive dup flip included") {
    val folded = TextAnalysis.dataCardFromState(
      TextAnalysis.mergeDataCardState(
        TextAnalysis.mergeDataCardState(state(b1), state(b2)), state(b3)))
    val rebuild = TextAnalysis.dataCardFromState(
      state(b1.unionByName(b2).unionByName(b3)))
    assert(canon(folded) === canon(rebuild))
    // the retroactive flips: doc 1 (en/web) became a dup when batch 2
    // delivered its normalized twin into en/books; doc 3 (fr/web) when
    // batch 3 redelivered it under fr/crawl — neither batch rescanned
    // the original
    val m = canon(folded).map(r => (r._1, r._2) -> r).toMap
    assert(m(("en", "web"))._6 === 1L, m.toString)   // doc 1 flipped
    assert(m(("en", "books"))._6 === 1L)             // doc 4 is a dup
    assert(m(("fr", "web"))._6 === 1L)               // doc 3 flipped
    assert(m(("fr", "crawl"))._6 === 1L)
    assert(m(("en", "web"))._7 === 1L, "PII doc counted")
  }

  test("fold order and slicing are irrelevant (counter-merge associativity)") {
    val all = b1.unionByName(b2).unionByName(b3)
    val a = TextAnalysis.dataCardFromState(
      TextAnalysis.mergeDataCardState(state(b3), state(b1.unionByName(b2))))
    assert(canon(a) === canon(TextAnalysis.dataCardFromState(state(all))))
  }
}
