package graft

import graft.operators.TextAnalysis

/** d14 exact-substring dedup (Lee 2021's unaligned-run family):
  * content-defined anchor segmentation must catch a duplicated run at
  * DIFFERENT offsets in each document, remove its anchor-aligned
  * interior from the non-keeper only, and leave short shared phrases,
  * intra-doc repeats, and all keeper text intact. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val W = 4; private val S = 8; private val MIN = 30

  // a 60-token run of distinct tokens — long enough that content-defined
  // anchors (expected every ~8 tokens) exist inside it and the interior
  // island clears the 30-token minimum even after the ~2*stride fringe
  private val run = (0 until 60).map(i => f"run$i%02d").mkString(" ")
  private val docs = Seq(
    // keeper (min doc_id): run at offset 7
    (1L, "pa0 pa1 pa2 pa3 pa4 pa5 pa6 " + run + " sa0 sa1 sa2 sa3 sa4"),
    // same run, UNALIGNED: offset 13, different fringe text
    (2L, (0 until 13).map(i => f"pb$i%02d").mkString(" ") + " " + run +
      " sb0 sb1 sb2"),
    // shares only a SHORT phrase (10 tokens) with doc 4 — below minRun
    (3L, "short shared phrase one two three four five six seven plus own words"),
    (4L, "other start short shared phrase one two three four five six seven tail"),
    // intra-doc repeat of a 40-token block — cross-doc contract keeps it
    (5L, {
      val block = (0 until 40).map(i => f"ir$i%02d").mkString(" ")
      block + " middle " + block
    })
  ).toDF("doc_id", "text")

  private def outMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("unaligned duplicated run: interior removed from non-keeper only") {
    val out = outMap(TextAnalysis.exactSubstrDedup(docs, "text", "doc_id",
      W, S, MIN))
    val (n1, k1, _) = out(1L)
    assert(n1 == k1, "keeper doc must be untouched")
    val (n2, k2, t2) = out(2L)
    assert(k2 < n2, "non-keeper must lose the run's interior")
    val removed = n2 - k2
    assert(removed >= MIN && removed <= 60,
      s"removal must be >= minRun and within the run, got $removed")
    val toks2 = t2.split("\\s+").toSeq
    // all fringe (non-run) tokens survive, in order
    val fringe = (0 until 13).map(i => f"pb$i%02d") ++ Seq("sb0", "sb1", "sb2")
    assert(fringe.forall(toks2.contains), "no token outside the run may go")
    // the removal is ONE contiguous block of run tokens (consecutive
    // segments chain into one island): surviving run tokens split into
    // a head fringe and a tail fringe, each a prefix/suffix of the run
    val keptRun = toks2.filter(_.startsWith("run")).map(_.drop(3).toInt)
    assert(keptRun == keptRun.sorted, "survivors keep document order")
    val gaps = keptRun.zip(keptRun.drop(1)).count { case (a, b) => b != a + 1 }
    assert(gaps <= 1, s"removed block must be contiguous, kept=$keptRun")
  }

  test("short shared phrase below minRun survives everywhere") {
    val out = outMap(TextAnalysis.exactSubstrDedup(docs, "text", "doc_id",
      W, S, MIN))
    assert(out(3L)._1 == out(3L)._2 && out(4L)._1 == out(4L)._2,
      "a 10-token shared phrase is below the 30-token run minimum")
  }

  test("intra-document repeats are kept (cross-doc contract)") {
    val out = outMap(TextAnalysis.exactSubstrDedup(docs, "text", "doc_id",
      W, S, MIN))
    assert(out(5L)._1 == out(5L)._2, "per-doc repetition is t09's signal")
  }

  test("segmentation partitions the document exactly and aligns in runs") {
    import graft.expressions.TextExpressions.anchorSegments
    import org.apache.spark.sql.functions._
    val segs = docs.select(col("doc_id"),
        explode(anchorSegments(col("text"), W, S)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.len").as("len"),
        col("s.h").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byDoc = segs.groupBy(_._1)
    // sum(len) == n_tokens and segments are adjacent (partition exactly)
    for ((d, ss) <- byDoc) {
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._2 == 0, s"doc $d must start at 0")
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._2 + a._3 == b._2, s"doc $d segments must be adjacent")
      }
    }
    // alignment: docs 1 and 2 share interior segment hashes (the run's
    // content-defined interior), despite different offsets
    val shared = byDoc(1L).map(_._4).toSet.intersect(byDoc(2L).map(_._4).toSet)
    assert(shared.nonEmpty, "shared run must produce identical interior segments")
  }

  test("delta mode equals full rebuild under the append contract") {
    // old corpus: docs 1/2 share the run (2 loses); batch doc 50 copies
    // the same run (must lose to the OLD keeper via the keeper table),
    // batch docs 51/52 share a NEW run (52 loses to batch-mate 51),
    // batch doc 53 is clean
    val newRun = (0 until 60).map(i => f"nr$i%02d").mkString(" ")
    val batch = Seq(
      (50L, "pc0 pc1 pc2 " + run + " sc0 sc1"),
      (51L, "pd0 pd1 " + newRun + " sd0"),
      (52L, (0 until 9).map(i => f"pe$i%02d").mkString(" ") + " " + newRun),
      (53L, "entirely fresh content with no shared runs at all here")
    ).toDF("doc_id", "text")
    val full = outMap(TextAnalysis.exactSubstrDedup(
      docs.unionByName(batch), "text", "doc_id", W, S, MIN))
    val keepers = TextAnalysis.substrKeepers(docs, "text", "doc_id", W, S)
    val delta = outMap(
      TextAnalysis.exactSubstrDedup(docs, "text", "doc_id", W, S, MIN)
        .unionByName(TextAnalysis.exactSubstrDedupDelta(batch, "text",
          "doc_id", keepers, W, S, MIN)))
    assert(delta == full, "delta(batch) ∪ full(old) must equal full(old ∪ batch)")
    // the planted cases fired
    assert(delta(50L)._2 < delta(50L)._1, "doc 50 must lose the old run")
    assert(delta(52L)._2 < delta(52L)._1, "doc 52 must lose to batch-mate 51")
    assert(delta(51L)._1 == delta(51L)._2 && delta(53L)._1 == delta(53L)._2,
      "batch keeper and clean doc stay intact")
    // keeper-table fold: merged table equals one built from the union
    val merged = TextAnalysis.mergeSubstrKeepers(keepers, batch, "text",
        "doc_id", W, S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = TextAnalysis.substrKeepers(docs.unionByName(batch), "text",
        "doc_id", W, S)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == rebuilt)
  }

  test("d14 removal is a subset of the stride-1 d12 coverage") {
    val two = docs.filter(org.apache.spark.sql.functions.col("doc_id") <= 2L)
    val d14 = outMap(TextAnalysis.exactSubstrDedup(two, "text", "doc_id",
      W, S, MIN))
    val d12 = outMap(TextAnalysis.spanDedup(two, "text", "doc_id", k = 10))
    // the window family trims the run exactly; the anchor family leaves
    // the fringe — on the same corpus it can only remove LESS
    assert(d14(2L)._2 >= d12(2L)._2,
      s"anchor family keeps the fringe: d14 kept=${d14(2L)._2} d12 kept=${d12(2L)._2}")
    assert(d14(1L)._1 == d14(1L)._2 && d12(1L)._1 == d12(1L)._2)
  }
}
