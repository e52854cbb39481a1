package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Dedup.allPairsContainment]] — the asymmetric-prefix exact
  * containment join must equal the naive role-ordered quadratic on
  * every fixture (prefix bound + positional filter are LOSSLESS),
  * decide membership and cont_nano in pure integer arithmetic, honor
  * the minN exclusion, and never plan a cartesian product. */
class AllPairsContainmentSpec extends SparkSpec {
  import spark.implicits._

  /** Naive quadratic over the SAME hashed-set base: role-ordered
    * (smaller set is id1; id asc on ties), gate tauDen·o >= tauNum·n1,
    * cont_nano = (2e9·o + n1) div (2·n1). */
  private def naive(df: DataFrame, textCol: String, n: Int,
                    tauNum: Int, tauDen: Int, minN: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val base = df.select(col("doc_id").cast("long").as("id"),
        graft.expressions.HashExpressions
          .md5Set(Dedup.wordShingles(col(textCol), n)).as("shs"))
      .withColumn("n", size(col("shs")).cast("long"))
      .filter(col("n") >= minN)
    val a = base.select(col("id").as("id1"), col("shs").as("shs1"),
      col("n").as("n1"))
    val b = base.select(col("id").as("id2"), col("shs").as("shs2"),
      col("n").as("n2"))
    a.crossJoin(b)
      .filter(col("n1") < col("n2") ||
        (col("n1") === col("n2") && col("id1") < col("id2")))
      .withColumn("o", size(array_intersect(col("shs1"), col("shs2")))
        .cast("long"))
      .filter(lit(tauDen.toLong) * col("o") >= lit(tauNum.toLong) * col("n1"))
      .withColumn("cont_nano",
        expr("(2000000000 * o + n1) div (2 * n1)"))
      .select("id1", "id2", "n1", "n2", "o", "cont_nano")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  private def run(df: DataFrame, textCol: String, n: Int,
                  tauNum: Int, tauDen: Int, minN: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    Dedup.allPairsContainment(df, textCol, "doc_id", n, tauNum, tauDen, minN)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("hand case at tau=1/2, minN=2: boundary kept, subset scores 1.0, size ties id-ordered, minN excludes, empty/null absent") {
    val docs = Seq(
      (1L, "a b c d"),          // n=4
      (2L, "a b x y z w"),      // n=6; vs 1: o=2, 2/4 = tau EXACTLY -> keep
      (3L, "a q r s t u"),      // n=6; o=1 with everything -> dropped
      (4L, "a b c d e f g h"),  // n=8; contains 1 fully -> 1.0
      (5L, "c d"),              // n=2 = minN; subset of 1 and 4 -> 1.0
      (6L, "c"),                // n=1 < minN -> excluded even as a subset
      (7L, ""),                 // no shingles -> absent
      (8L, null.asInstanceOf[String]),
      (9L, "a b c e")           // n=4; vs 1 (tie) o=3 -> 0.75, id1=1
    ).toDF("doc_id", "text")
    val got = run(docs, "text", n = 1, tauNum = 1, tauDen = 2, minN = 2)
    assert(got == Set(
      (1L, 2L, 4L, 6L, 2L, 500000000L),
      (1L, 4L, 4L, 8L, 4L, 1000000000L),
      (5L, 1L, 2L, 4L, 2L, 1000000000L),
      (1L, 9L, 4L, 4L, 3L, 750000000L),
      (9L, 2L, 4L, 6L, 2L, 500000000L),
      (5L, 4L, 2L, 8L, 2L, 1000000000L),
      (9L, 4L, 4L, 8L, 4L, 1000000000L),
      (5L, 9L, 2L, 4L, 1L, 500000000L)), got.toString)
    assert(got == naive(docs, "text", 1, 1, 2, 2))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L),
      "a below-minN set must never pair, even as a perfect subset")
  }

  test("asymmetric prefix + positional filter lossless on the real corpus (saturated and rarity regimes); partitioning-invariant; no cartesian") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    // saturated width-3 regime
    val got = run(docs, "text", n = 3, tauNum = 1, tauDen = 2, minN = 3)
    assert(got.nonEmpty)
    assert(got == naive(docs, "text", 3, 1, 2, 3))
    assert(run(docs.repartition(7), "text", 3, 1, 2, 3) == got)
    // a looser threshold widens the small-side prefix and weakens the
    // positional bound — must stay lossless and contain the tight set
    val loose = run(docs, "text", n = 3, tauNum = 1, tauDen = 5, minN = 3)
    assert(loose == naive(docs, "text", 3, 1, 5, 3))
    assert(got.subsetOf(loose))
    // rarity width-5 regime
    val rare = run(docs, "text", n = 5, tauNum = 1, tauDen = 3, minN = 5)
    assert(rare == naive(docs, "text", 5, 1, 3, 5))
    val plan = Dedup.allPairsContainment(docs, "text", "doc_id", 3, 1, 2, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("suffix filter (r15): depth-invariant containment output on the chimera corpus") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val aug = graft.queries.DataQueries.chimeraAug(docs)
    val base = run(aug, "text", n = 5, tauNum = 1, tauDen = 3, minN = 5)
    for (d <- Seq(1, 3, 6)) {
      val got = Dedup.allPairsContainment(aug, "text", "doc_id", 5, 1, 3,
          minN = 5, suffixDepth = d)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === base, s"suffixDepth=$d must be lossless")
    }
  }

  test("d31 chimera construction: mid-band partial containments exist and every cont_nano is the exact integer rounding") {
    // the gated query's deterministic quote/wrapper transform — half of
    // doc i followed by half of doc i+1 for an md5-selected 1-in-5 —
    // must yield pairs strictly between tau and 1.0 (the non-degeneracy
    // the raw bimodal corpus lacks), and the reported nano values must
    // equal round-half-up of 1e9·o/n1 computed in exact BigInt
    // arithmetic (no float anywhere in the operator).
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    // the PRODUCTION transform, not a spec-local copy (review r14)
    val aug = graft.queries.DataQueries.chimeraAug(docs)
    val got = run(aug, "text", n = 5, tauNum = 1, tauDen = 3, minN = 5)
    assert(got == naive(aug, "text", 5, 1, 3, 5))
    assert(got.exists(p => p._6 < 1000000000L),
      s"chimeras must create partial containments, got ${got.map(_._6)}")
    assert(got.exists(p => p._6 == 1000000000L),
      "the corpus's exact-truncation pairs must survive the transform")
    got.foreach { case (_, _, n1, _, o, nano) =>
      val exact = ((BigInt(2000000000L) * o + n1) / (BigInt(2) * n1)).toLong
      assert(nano == exact, s"cont_nano $nano != exact $exact for o=$o n1=$n1")
    }
  }

  // ---------------------------------------------------------------
  // delta form: batch vs frozen reference state (d33)
  // ---------------------------------------------------------------

  private def naiveCross(ref: DataFrame, batch: DataFrame, n: Int,
                         tauNum: Int, tauDen: Int, minN: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    def sets(df: DataFrame, pre: String) =
      df.select(col("doc_id").cast("long").as(pre + "_id"),
          graft.expressions.HashExpressions
            .md5Set(Dedup.wordShingles(col("text"), n)).as(pre + "_shs"))
        .withColumn("n_" + pre, size(col(pre + "_shs")).cast("long"))
        .filter(col("n_" + pre) >= minN)
    sets(ref, "ref").crossJoin(sets(batch, "batch"))
      .withColumn("o", size(array_intersect(col("ref_shs"),
        col("batch_shs"))).cast("long"))
      .withColumn("n_min", least(col("n_ref"), col("n_batch")))
      .filter(lit(tauDen.toLong) * col("o") >=
        lit(tauNum.toLong) * col("n_min"))
      .withColumn("cont_nano",
        expr("(2000000000 * o + n_min) div (2 * n_min)"))
      .select("ref_id", "batch_id", "n_ref", "n_batch", "o", "cont_nano")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  private def delta(ref: DataFrame, batch: DataFrame, n: Int,
                    tauNum: Int, tauDen: Int, minN: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val (freq, sp, bp, base) = Dedup.allPairsContainmentState(
      ref, "text", "doc_id", n, tauNum, tauDen, minN)
    Dedup.allPairsContainmentDelta(batch, "text", "doc_id", n,
        tauNum, tauDen, minN, freq, sp, bp, base)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("delta == naive batch-x-ref on the chimera corpus; both role paths fire; no cartesian") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val aug = graft.queries.DataQueries.chimeraAug(docs)
    val h = graft.functions.GraftFunctions
      .md5Long(col("doc_id").cast("string"))
    val ref = aug.filter(h % 5 =!= 1)
    val batch = aug.filter(h % 5 === 1)
    val got = delta(ref, batch, 5, 1, 3, 5)
    assert(got.nonEmpty)
    assert(got == naiveCross(ref, batch, 5, 1, 3, 5))
    // the asymmetric family needs BOTH role paths live: pairs where
    // the batch doc is the smaller side and pairs where it contains
    assert(got.exists(p => p._4 < p._3) && got.exists(p => p._4 > p._3),
      s"both roles must occur, got sizes ${got.map(p => (p._3, p._4))}")
    val (freq, sp, bp, base) = Dedup.allPairsContainmentState(
      ref, "text", "doc_id", 5, 1, 3, 5)
    val plan = Dedup.allPairsContainmentDelta(batch, "text", "doc_id", 5,
      1, 3, 5, freq, sp, bp, base).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("delta under drift: batch sets full of frozen-unseen shingles still link losslessly") {
    // unseen hashes rank frequency-0 (rarest) and fill the batch
    // prefixes — the frozen-order contract must not lose the pair, and
    // ties route through exactly one role path (no duplicates)
    val ref = Seq(
      (1L, "k1 k2 k3 k4 k5"),
      (2L, "k1 k2 c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "k1 k2 k3 u1 u2"),       // o=3 vs ref1: 3/5 keep (tie size)
      (11L, "u3 u4 u5 u6 u7"),       // all unseen: no pair
      (12L, "k1 k2 k3 k4 k5 u8 u9 u10 u11 u12") // contains ref1: 5/5
    ).toDF("doc_id", "text")
    val got = delta(ref, batch, 1, 1, 2, 5)
    assert(got == naiveCross(ref, batch, 1, 1, 2, 5))
    assert(got.map(p => (p._1, p._2)) == Set((1L, 10L), (1L, 12L)),
      got.toString)
    // tie-size pairs must come from exactly one role path: the raw
    // relation carries no duplicate rows (a Set would mask them)
    val (freq, sp, bp, base) = Dedup.allPairsContainmentState(
      ref, "text", "doc_id", 1, 1, 2, 5)
    assert(Dedup.allPairsContainmentDelta(batch, "text", "doc_id", 1,
      1, 2, 5, freq, sp, bp, base).count() == got.size)
  }
}
