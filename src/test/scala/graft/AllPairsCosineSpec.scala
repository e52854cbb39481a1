package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Dedup.allPairsCosine]] — the prefix-filtered exact similarity join
  * must equal the naive all-pairs cosine on every fixture (the blocking
  * is LOSSLESS, unlike the LSH families), decide membership in pure
  * integer arithmetic, and never plan a cartesian product. */
class AllPairsCosineSpec extends SparkSpec {
  import spark.implicits._

  /** Naive quadratic reference over the SAME hashed-set base the
    * operator builds (md5Set ∘ wordShingles): isolates exactly the
    * prefix-filter + verification path under test. */
  private def naive(df: DataFrame, textCol: String, n: Int,
                    tauNum: Int, tauDen: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val t2n = tauNum.toLong * tauNum
    val t2d = tauDen.toLong * tauDen
    val base = df.select(col("doc_id").cast("long").as("id"),
        graft.expressions.HashExpressions
          .md5Set(Dedup.wordShingles(col(textCol), n)).as("shs"))
      .withColumn("n", size(col("shs")).cast("long"))
      .filter(col("n") > 0)
    val a = base.select(col("id").as("id1"), col("shs").as("shs1"),
      col("n").as("n1"))
    val b = base.select(col("id").as("id2"), col("shs").as("shs2"),
      col("n").as("n2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("o", size(array_intersect(col("shs1"), col("shs2")))
        .cast("long"))
      .filter(lit(t2d) * col("o") * col("o") >=
        lit(t2n) * col("n1") * col("n2"))
      .withColumn("cos_nano", floor(col("o").cast("double") /
        sqrt((col("n1") * col("n2")).cast("double")) * lit(1e9) +
        lit(0.5)).cast("long"))
      .select("id1", "id2", "n1", "n2", "o", "cos_nano")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  private def run(df: DataFrame, textCol: String, n: Int,
                  tauNum: Int, tauDen: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] =
    Dedup.allPairsCosine(df, textCol, "doc_id", n, tauNum, tauDen)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("hand case at tau=3/5: boundary pair kept, below-threshold dropped, exact dup scores 1.0, unequal sizes in-band, empty/null docs absent") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c x y"),           // vs 1: o=3, cos = 3/5 EXACTLY (gate is >=)
      (3L, "a b z w v"),           // vs 1 and 2: o=2, cos 0.4 -> dropped
      (4L, "a b c d e"),           // exact dup of 1 -> cos 1.0
      (5L, "a b c d e f g h i j"), // vs 1/4: o=5, cos 5/sqrt(50) ~ 0.707
      (6L, ""),                    // no shingles -> absent
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = run(docs, "text", n = 1, tauNum = 3, tauDen = 5)
    val c55 = 600000000L   // 3/sqrt(25)
    val c510 = 707106781L  // floor(5/sqrt(50)*1e9+0.5)
    assert(got == Set(
      (1L, 2L, 5L, 5L, 3L, c55),
      (1L, 4L, 5L, 5L, 5L, 1000000000L),
      (1L, 5L, 5L, 10L, 5L, c510),
      (2L, 4L, 5L, 5L, 3L, c55),
      (4L, 5L, 5L, 10L, 5L, c510)), got.toString)
    assert(got == naive(docs, "text", 1, 3, 5))
  }

  test("prefix filtering is lossless on the real corpus; partitioning-invariant; no cartesian; integer gate only") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val got = run(docs, "text", n = 3, tauNum = 3, tauDen = 5)
    assert(got.nonEmpty)
    assert(got == naive(docs, "text", 3, 3, 5))
    assert(run(docs.repartition(7), "text", 3, 3, 5) == got)
    // a lower threshold widens prefixes but must stay lossless
    val loose = run(docs, "text", n = 3, tauNum = 1, tauDen = 5)
    assert(loose == naive(docs, "text", 3, 1, 5))
    assert(loose.size >= got.size && got.subsetOf(loose))
    val plan = Dedup.allPairsCosine(docs, "text", "doc_id", 3, 3, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("suffix filter (r15): depth-invariant output on the real corpus; the bound really is an upper bound") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val base = run(docs, "text", n = 3, tauNum = 3, tauDen = 5)
    for (d <- Seq(1, 3, 6)) {
      val got = Dedup.allPairsCosine(docs, "text", "doc_id", 3, 3, 5,
          suffixDepth = d)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === base, s"suffixDepth=$d must be lossless")
    }
    // bound >= exact overlap on every corpus pair, at every depth —
    // the losslessness premise, checked directly against
    // array_intersect over the operator's own hashed-set base
    val hashed = docs.select(col("doc_id").cast("long").as("id"),
        graft.expressions.HashExpressions
          .md5Set(Dedup.wordShingles(col("text"), 3)).as("shs"))
      .filter(size(col("shs")) > 0)
    val a = hashed.select(col("id").as("id1"), col("shs").as("shs1"))
    val b = hashed.select(col("id").as("id2"), col("shs").as("shs2"))
    val pairs = a.crossJoin(b).filter(col("id1") < col("id2"))
      .limit(2000)
    for (d <- Seq(1, 2, 4)) {
      val viol = pairs.withColumn("o",
          size(array_intersect(col("shs1"), col("shs2"))).cast("long"))
        .withColumn("sb", graft.expressions.HashExpressions
          .suffixOverlapBound(col("shs1"), col("shs2"), d))
        .filter(col("sb") < col("o"))
        .count()
      assert(viol === 0L, s"depth $d: $viol pairs with bound < overlap")
    }
  }

  test("width-5 tau=2/5 (d28, the realistic-rarity regime): lossless, non-degenerate, selective") {
    // width-3 on this corpus is SATURATED (31-token pool caps the
    // 3-shingle space); width-5 has genuine rarity (95% of shingles at
    // df=1 on sf0.01) — the regime a real web corpus is in. The gate
    // output must be non-degenerate: real partial overlaps, not just
    // exact-set pairs, with co-occurring pairs below tau proving the
    // threshold actually selects.
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val got = run(docs, "text", n = 5, tauNum = 2, tauDen = 5)
    assert(got.nonEmpty)
    assert(got == naive(docs, "text", 5, 2, 5), "prefix filter must stay lossless at width 5")
    assert(got.forall { case (_, _, n1, n2, o, _) => o < math.max(n1, n2) },
      s"every pair a genuine partial overlap, got $got")
    // tau selects: the zero-threshold co-occurrence set is strictly larger
    val all = run(docs, "text", n = 5, tauNum = 1, tauDen = 1000)
    assert(all.size > got.size,
      s"pairs below tau must exist (${all.size} co-occurring vs ${got.size} gated)")
    assert(got.subsetOf(all))
  }

  // ---------------------------------------------------------------
  // delta form: batch vs frozen reference state
  // ---------------------------------------------------------------

  private def naiveCross(ref: DataFrame, batch: DataFrame, n: Int,
                         tauNum: Int, tauDen: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val t2n = tauNum.toLong * tauNum
    val t2d = tauDen.toLong * tauDen
    def sets(df: DataFrame, pre: String) =
      df.select(col("doc_id").cast("long").as(pre + "_id"),
          graft.expressions.HashExpressions
            .md5Set(Dedup.wordShingles(col("text"), n)).as(pre + "_shs"))
        .withColumn("n_" + pre, size(col(pre + "_shs")).cast("long"))
        .filter(col("n_" + pre) > 0)
    sets(ref, "ref").crossJoin(sets(batch, "batch"))
      .withColumn("o", size(array_intersect(col("ref_shs"),
        col("batch_shs"))).cast("long"))
      .filter(lit(t2d) * col("o") * col("o") >=
        lit(t2n) * col("n_ref") * col("n_batch"))
      .withColumn("cos_nano", floor(col("o").cast("double") /
        sqrt((col("n_ref") * col("n_batch")).cast("double")) * lit(1e9) +
        lit(0.5)).cast("long"))
      .select("ref_id", "batch_id", "n_ref", "n_batch", "o", "cos_nano")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  private def delta(ref: DataFrame, batch: DataFrame, n: Int,
                    tauNum: Int, tauDen: Int)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val (freq, prefix, base) =
      Dedup.allPairsCosineState(ref, "text", "doc_id", n, tauNum, tauDen)
    Dedup.allPairsCosineDelta(batch, "text", "doc_id", n, tauNum, tauDen,
        freq, prefix, base)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("delta == naive batch-x-ref on the real corpus; no cartesian") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val h = graft.functions.GraftFunctions
      .md5Long(col("doc_id").cast("string"))
    val ref = docs.filter(h % 5 =!= 1)
    val batch = docs.filter(h % 5 === 1)
    val got = delta(ref, batch, 3, 3, 5)
    assert(got == naiveCross(ref, batch, 3, 3, 5))
    val (freq, prefix, base) =
      Dedup.allPairsCosineState(ref, "text", "doc_id", 3, 3, 5)
    val plan = Dedup.allPairsCosineDelta(batch, "text", "doc_id", 3, 3, 5,
      freq, prefix, base).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("delta in the rarity regime (d30): width-5 tau=2/5 == naive batch-x-ref") {
    // the frozen-order contract exercised where unseen-hash=frequency-0
    // is the COMMON case (95% of 5-shingles at df=1), not the corner
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val h = graft.functions.GraftFunctions
      .md5Long(col("doc_id").cast("string"))
    val ref = docs.filter(h % 5 =!= 1)
    val batch = docs.filter(h % 5 === 1)
    val got = delta(ref, batch, 5, 2, 5)
    assert(got == naiveCross(ref, batch, 5, 2, 5))
  }

  test("delta under drift: batch shingles unseen by the frozen reference order stay lossless") {
    // batch docs share a rare core with the reference but are MOSTLY
    // made of tokens the reference has never seen — their rarest-first
    // prefixes fill with frequency-0 hashes, which must not lose the
    // true pair (the frozen-order contract)
    val ref = Seq(
      (1L, "k1 k2 k3 k4 k5"),
      (2L, "k1 k2 k3 c1 c2"),
      (3L, "c1 c2 c3 c4 c5")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "k1 k2 k3 k4 u1"),  // vs ref 1: o=4,cos 0.8 KEEP (u1 unseen)
      (11L, "u2 u3 u4 u5 u6"),  // all unseen: no pair
      (12L, "k1 k2 k3 u7 u8")   // vs ref 1: o=3, cos 0.6 KEEP boundary;
                                // vs ref 2: o=3, 0.6 KEEP
    ).toDF("doc_id", "text")
    val got = delta(ref, batch, 1, 3, 5)
    assert(got == naiveCross(ref, batch, 1, 3, 5))
    // (2,10) shares the k1..k3 core too: cos exactly 3/5, kept
    assert(got.map(p => (p._1, p._2)) ==
      Set((1L, 10L), (2L, 10L), (1L, 12L), (2L, 12L)), got.toString)
  }

  // ---------------------------------------------------------------
  // novelty scoring against the frozen reference (t30)
  // ---------------------------------------------------------------

  test("noveltyScores: hand case, exact integer ppm, zero-shingle docs absent; matches a set replay on the real corpus") {
    val ref = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    val (freq, _, _) =
      Dedup.allPairsCosineState(ref, "text", "doc_id", 1, 3, 5)
    val batch = Seq(
      (10L, "a b x"),   // 2 of 3 seen -> 333333 ppm
      (11L, "a b c"),   // all seen -> 0
      (12L, "p q r"),   // none seen -> 1000000
      (13L, "")         // no shingles -> absent
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScores(batch, "text", "doc_id", 1, freq)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((10L, 3L, 2L, 333333L), (11L, 3L, 3L, 0L),
      (12L, 3L, 0L, 1000000L)), got.toString)
    // real corpus: replay with plain Scala sets over the same shingles
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val h = graft.functions.GraftFunctions
      .md5Long(col("doc_id").cast("string"))
    val refDf = docs.filter(h % 5 =!= 1)
    val batchDf = docs.filter(h % 5 === 1)
    val (rf, _, _) =
      Dedup.allPairsCosineState(refDf, "text", "doc_id", 3, 3, 5)
    val out = Dedup.noveltyScores(batchDf, "text", "doc_id", 3, rf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
          graft.expressions.HashExpressions
            .md5Set(Dedup.wordShingles(col("text"), 3)).as("shs"))
        .as[(Long, Seq[Long])].collect()
    val refSet = sets(refDf).flatMap(_._2).toSet
    val expect = sets(batchDf).filter(_._2.nonEmpty).map { case (id, shs) =>
      val seen = shs.count(refSet.contains).toLong
      (id, shs.size.toLong, seen,
        1000000L * (shs.size - seen) / shs.size)
    }.sortBy(_._1).toSeq
    assert(out == expect)
    assert(out.exists(_._4 > 0L) && out.exists(_._4 < 1000000L),
      s"novelty should be non-degenerate: ${out.map(_._4).distinct}")
  }
}
