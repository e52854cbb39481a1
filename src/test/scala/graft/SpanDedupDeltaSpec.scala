package graft

import graft.operators.TextAnalysis

/** Incremental span dedup (d12 delta mode): under the append contract
  * (batch ids exceed all existing ids), rewriting only the batch against
  * the materialized span-keeper table must equal a full rebuild of the
  * combined corpus — old outputs stable, new docs losing exactly the
  * spans the full pass would take from them. */
class SpanDedupDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  // old corpus: doc 1/2 share a span; doc 3 is clean; doc 4 has an
  // internal repeat (must be KEPT by both paths); doc 5 has a span no
  // one else has yet — until the batch arrives
  private val oldDocs = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "zeta alpha beta gamma eta theta"),
    (3L, "totally unrelated words live here"),
    (4L, "ping pong ping pong ping pong"),
    (5L, "rare span sentinel plus filler words")
  ).toDF("doc_id", "text")
  // batch (ids > all old ids): doc 10 copies doc 5's rare span (must
  // lose it to doc 5); doc 11 and 12 share a NEW span (12 loses to 11);
  // doc 13 is clean; doc 14 shares with OLD doc 1 (loses)
  private val batch = Seq(
    (10L, "rare span sentinel appears again now"),
    (11L, "fresh shared run of tokens here"),
    (12L, "another fresh shared run of tokens"),
    (13L, "nothing in common with anything else"),
    (14L, "alpha beta gamma delta closing words")
  ).toDF("doc_id", "text")

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).sortBy(_._1).toSeq

  test("append-then-delta equals full rebuild") {
    val full = collectOut(
      TextAnalysis.spanDedup(oldDocs.unionByName(batch), "text", "doc_id", k))
    val keepers = TextAnalysis.spanKeepers(oldDocs, "text", "doc_id", k)
    val incremental = collectOut(
      TextAnalysis.spanDedup(oldDocs, "text", "doc_id", k).unionByName(
        TextAnalysis.spanDedupDelta(batch, "text", "doc_id", keepers, k)))
    assert(incremental == full)
    // the planted cases actually fired: 10 lost its copied span to 5,
    // 14 lost to 1, 12 lost to 11, while 11/13 stayed intact
    val byId = incremental.map(r => r._1 -> r).toMap
    assert(byId(10L)._3 < byId(10L)._2, "doc 10 must lose the copied span")
    assert(byId(14L)._3 < byId(14L)._2, "doc 14 must lose doc 1's span")
    assert(byId(12L)._3 < byId(12L)._2, "doc 12 must lose to batch-mate 11")
    assert(byId(11L)._3 == byId(11L)._2 && byId(13L)._3 == byId(13L)._2,
      "keepers/clean docs stay intact")
  }

  test("old outputs are stable under append (keeper monotonicity)") {
    val before = collectOut(TextAnalysis.spanDedup(oldDocs, "text", "doc_id", k))
    val after = collectOut(
      TextAnalysis.spanDedup(oldDocs.unionByName(batch), "text", "doc_id", k))
      .filter(_._1 <= 5L)
    assert(before == after,
      "appending higher-id docs must never rewrite existing docs")
  }

  test("keeper-table maintenance: merge equals rebuild-from-scratch") {
    val merged = TextAnalysis.mergeSpanKeepers(
        TextAnalysis.spanKeepers(oldDocs, "text", "doc_id", k),
        batch, "text", "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val scratch = TextAnalysis.spanKeepers(
        oldDocs.unionByName(batch), "text", "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(merged == scratch)
  }
}
