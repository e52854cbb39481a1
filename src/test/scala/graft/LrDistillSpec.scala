package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** [[TextAnalysis.logisticDistillFit]] / [[logisticDistillScore]] — the
  * t28 rule-distillation contract: a bit-deterministic distributed fit
  * (exact-decimal sums), a float-free integer scoring gate, sidecar
  * round-trip, and real distillation power on the corpus. */
class LrDistillSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents

  test("fit is bit-deterministic: two fits (different partitioning) produce identical literals") {
    val m1 = TextAnalysis.logisticDistillFit(docs, "text", "doc_id")
    val m2 = TextAnalysis.logisticDistillFit(docs.repartition(7), "text", "doc_id")
    assert(m1 == m2, s"$m1 vs $m2")
  }

  test("distillation beats the majority baseline and clears 85% on the real corpus; prediction is the sign of the integer score") {
    val m = TextAnalysis.logisticDistillFit(docs, "text", "doc_id")
    val out = TextAnalysis.logisticDistillScore(docs, "text", "doc_id", m)
      .select("score_nano", "pred", "label", "correct")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (s, p, l, c) =>
      assert(p == (s >= 0L)); assert(c == (p == l))
    }
    val acc = out.count(_._4).toDouble / out.length
    val posRate = out.count(_._3).toDouble / out.length
    val majority = math.max(posRate, 1 - posRate)
    assert(acc >= 0.85, s"accuracy $acc")
    assert(acc > majority, s"accuracy $acc vs majority $majority")
  }

  test("a rule that varies in one feature only is learned exactly") {
    // all docs pass every Gopher rule except word count, which splits
    // them: the fit must recover a (near-)perfect linear separation
    val mk = (n: Int) => (("the be to of and that have with " * 20)
      .trim.split(" ").take(8).mkString(" ") + " " +
      Seq.fill(n)("common").mkString(" "))
    val docsDf = (1 to 40).map { i =>
      val n = if (i % 2 == 0) 60 else 20 // pass vs fail word count
      (i.toLong, mk(n))
    }.toDF("doc_id", "text")
    val m = TextAnalysis.logisticDistillFit(docsDf, "text", "doc_id")
    val out = TextAnalysis.logisticDistillScore(docsDf, "text", "doc_id", m)
      .select("correct").as[Boolean].collect()
    assert(out.forall(identity), s"${out.count(!_)} misclassified of ${out.length}")
  }

  test("scoring is map-only (no exchange, no join) and matches a driver-side replay of the integer dot product") {
    val m = TextAnalysis.logisticDistillFit(docs, "text", "doc_id")
    val scored = TextAnalysis.logisticDistillScore(docs, "text", "doc_id", m)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    val feats = TextAnalysis.lrFeatures(docs, "text", "doc_id")
      .select(col("doc_id"), col("x"), col("y"))
      .as[(Long, Seq[Long], Double)].collect()
      .map { case (id, x, y) => id -> (x, y) }.toMap
    val got = scored.select("doc_id", "score_nano", "label")
      .as[(Long, Long, Boolean)].collect()
    got.foreach { case (id, s, l) =>
      val (x, y) = feats(id)
      val expect = m.bNano + x.zip(m.wNano).map { case (xi, wi) => xi * wi }.sum
      assert(s == expect, s"doc $id: $s vs $expect")
      assert(l == (y > 0.5))
    }
  }

  test("mega-token document saturates to a clamped score instead of an ANSI cast error (VERDICT r14)") {
    // one 1e6-char word -> mwl_micro = 1e12; a 1e8-magnitude weight on
    // that feature pushes the DECIMAL dot past 2^63 in both directions.
    // The previous raw .cast(LongType) threw here; the clamp must score
    // the doc with the sign preserved (pred exact on saturation).
    val mega = Seq((1L, "x" * 1000000), (2L, "the quick brown fox jumps"))
      .toDF("doc_id", "text")
    // lrFeatureNames order: mwl_micro is the 2nd feature
    def m(w: Long) = TextAnalysis.LrModel(
      Seq(0L, w, 0L, 0L, 0L, 0L, 0L), 7L, 1)
    val pos = TextAnalysis.logisticDistillScore(mega, "text", "doc_id", m(100000000L))
      .select("doc_id", "score_nano", "pred")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(pos.head._2 == Long.MaxValue && pos.head._3,
      s"saturated-positive: ${pos.head}")
    assert(pos(1)._2 != Long.MaxValue, s"normal doc must not clamp: ${pos(1)}")
    val neg = TextAnalysis.logisticDistillScore(mega, "text", "doc_id", m(-100000000L))
      .select("doc_id", "score_nano", "pred")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(neg.head._2 == Long.MinValue && !neg.head._3,
      s"saturated-negative: ${neg.head}")
  }

  test("sidecar round-trip: write/read identical; stale token reads as absent") {
    val dir = java.nio.file.Files.createTempDirectory("lr_sidecar_").toString
    // a tiny real documents.parquet so the content token has files to fold
    docs.limit(5).write.parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.LrModel(Seq(1L, -2L, 3L, 0L, 5L, -6L, 7L), -42L, 8)
    graft.io.ModelSidecar.writeLr(dir, m, "rows=5 digest=abc")
    assert(graft.io.ModelSidecar.readLr(dir)
      .contains((m, "rows=5 digest=abc")))
    // mutate the table -> token mismatch -> absent (forces refit)
    docs.limit(7).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(graft.io.ModelSidecar.readLr(dir).isEmpty)
  }
}
