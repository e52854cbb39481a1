package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes ([[TextAnalysis.naiveBayesFit]] /
  * [[TextAnalysis.naiveBayesClassify]]): counting-only training with
  * integer nano-nat scores — separable classes must classify
  * correctly, the smoothed grid must be complete (classes × vocab),
  * vocab-less docs must fall back to the prior argmax with the
  * deterministic tie-break, and scores must be partition-invariant. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "en", "the cat sat on the mat and the dog barked"),
    (2L, "en", "the quick brown fox jumps over the lazy dog"),
    (3L, "en", "a cat and a dog met on the mat"),
    (4L, "fr", "le chat et le chien sont sur le tapis"),
    (5L, "fr", "le renard saute par dessus le chien"),
    (6L, "fr", "un chat et un chien sur le tapis"),
    (7L, "de", "die katze und der hund sitzen auf der matte"),
    (8L, "de", "der fuchs springt ueber den faulen hund"),
    (9L, "de", "eine katze und ein hund auf der matte")
  ).toDF("doc_id", "lang", "text")

  private def model(v: Int = 50) =
    TextAnalysis.naiveBayesFit(corpus, "text", "lang", v)

  test("separable classes classify correctly; scores are exact integers") {
    val (pri, grid) = model()
    val got = TextAnalysis.naiveBayesClassify(
        corpus, "text", "doc_id", "lang", pri, grid)
      .orderBy("doc_id")
      .select("doc_id", "pred_label", "is_correct")
      .as[(Long, String, Boolean)].collect()
    assert(got.length === 9)
    assert(got.forall(_._3), s"train-set accuracy must be 1.0 here: ${got.toSeq}")
    assert(got.map(_._2).toSeq ===
      Seq("en", "en", "en", "fr", "fr", "fr", "de", "de", "de"))
  }

  test("grid is the complete classes x vocab table (absent pairs at the smoothing floor)") {
    val (_, grid) = model(v = 10)
    assert(grid.count() === 3L * 10)
    // an absent (class, tok) pair carries exactly ln(1/(total_c+V))
    val floorLp = grid.groupBy("label").agg(min(col("lp")).as("m"))
      .select("m").as[Long].collect()
    assert(floorLp.forall(_ < 0L))
  }

  test("a doc with no vocab tokens falls back to the prior argmax, ties broken by label") {
    val (pri, grid) = model()
    // all classes have equal priors (3 docs each) -> tie -> 'de' (asc)
    val stranger = Seq((99L, "en", "zzz qqq xxx")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.naiveBayesClassify(
        stranger, "text", "doc_id", "lang", pri, grid)
      .select("pred_label").as[String].head()
    assert(got === "de")
  }

  test("literal fit == replayed fit within ±1 nano-nat, every parameter") {
    // the r12 literal contract (VERDICT r11 next-#1): t21's gate scores
    // with naiveBayesFitLiterals' collected integers; this pins the
    // demoted in-plan fit replay against them parameter-by-parameter.
    // Since r15 the literals quantize through ExactLn (host-exact ln of
    // the integer ratios) while the replay floors the JVM's libm ln —
    // the contract tolerates ±1 (a libm ulp across the flooring line).
    val m = TextAnalysis.naiveBayesFitLiterals(corpus, "text", "lang", 50)
    val (pri, grid) = model()
    val priRep = pri.as[(String, Long)].collect().toMap
    val gridRep = grid.as[(String, String, Long)].collect()
      .map { case (l, t, p) => (l, t) -> p }.toMap
    assert(m.priors.size === priRep.size)
    assert(m.grid.size === gridRep.size)
    for ((l, p) <- m.priors)
      assert(math.abs(p - priRep(l)) <= 1L, s"prior($l): $p vs ${priRep(l)}")
    for ((l, t, p) <- m.grid)
      assert(math.abs(p - gridRep((l, t))) <= 1L,
        s"grid($l,$t): $p vs ${gridRep((l, t))}")
    // same data, same JVM: the boundary headroom is real and recorded
    assert(m.minBoundaryDist > 0.0)
    // literal scoring == replayed-fit scoring on the training set
    val a = TextAnalysis.naiveBayesClassify(corpus, "text", "doc_id", "lang",
        m.priors.toDF("label", "prior_lp"), m.grid.toDF("label", "tok", "lp"))
      .select("doc_id", "pred_label", "score_nano")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val b = TextAnalysis.naiveBayesClassify(corpus, "text", "doc_id", "lang",
        pri, grid)
      .select("doc_id", "pred_label", "score_nano")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("scores are partition-invariant") {
    val (pri, grid) = model()
    def run(parts: Int) = TextAnalysis.naiveBayesClassify(
        corpus.repartition(parts), "text", "doc_id", "lang", pri, grid)
      .select("doc_id", "pred_label", "score_nano")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(run(1) === run(7))
  }
}
