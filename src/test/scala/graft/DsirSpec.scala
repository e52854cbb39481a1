package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** DSIR importance weighting (t38 — Xie et al. 2023): hashed-ngram
  * bucket log-ratios must rank target-like documents above raw-like
  * ones, with exact integer weights and the top-k selection cut. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (
    (1L to 20L).map(i => (i, "alpha beta alpha beta common", "en")) ++
    (21L to 40L).map(i => (i, "gamma delta gamma delta common", "fr")) ++
    Seq((100L, "alpha beta alpha", "fr"),   // target-LIKE text, raw label
        (101L, "gamma delta gamma", "en"))  // raw-like text, target label
  ).toDF("doc_id", "text", "lang")

  test("weights rank target-like text above raw-like text, regardless of label") {
    val delta = TextAnalysis.fitDsirDelta(docs, "text", col("lang") === "en")
    val w = TextAnalysis.dsirWeights(docs, "text", "doc_id", delta)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 100 carries the target distribution's ngrams -> positive pull
    assert(w(100L) > w(101L),
      s"target-like 100 (${w(100L)}) must outweigh raw-like 101 (${w(101L)})")
    // the bulk target docs outweigh the bulk raw docs
    assert(w(1L) > w(21L))
    // empty/feature-free docs weigh 0
    val zero = TextAnalysis.dsirWeights(
      Seq((1L, "")).toDF("doc_id", "text"), "text", "doc_id", delta)
      .head
    assert(zero.getAs[Long]("n_features") === 0L &&
      zero.getAs[Long]("dsir_weight_nano") === 0L)
  }

  test("n_features counts unigrams + bigrams") {
    val delta = TextAnalysis.fitDsirDelta(docs, "text", col("lang") === "en")
    val nf = TextAnalysis.dsirWeights(
        Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text"),
        "text", "doc_id", delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nf(1L) === 5L, "3 unigrams + 2 bigrams")
    assert(nf(2L) === 1L, "1 unigram, no bigram")
  }

  test("t38 gate shape: exactly k selected, flag consistent with the weight order") {
    val out = graft.queries.DataQueries
      .t38DsirSelect(spark, "/root/testdata/sf0.001").collect()
    val k = out.count(_.getAs[Long]("selected") == 1L)
    assert(k === math.min(100, out.length))
    val minSel = out.filter(_.getAs[Long]("selected") == 1L)
      .map(r => (r.getAs[Long]("dsir_weight_nano"), -r.getAs[Long]("doc_id")))
      .min
    val maxUnsel = out.filter(_.getAs[Long]("selected") == 0L)
      .map(r => (r.getAs[Long]("dsir_weight_nano"), -r.getAs[Long]("doc_id")))
      .max
    assert(Ordering[(Long, Long)].gt(minSel, maxUnsel),
      "every selected (weight, id-tiebreak) must beat every unselected")
  }
}
