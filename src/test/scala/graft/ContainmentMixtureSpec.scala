package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Containment decontamination (d10) and domain-mixture weights (t10). */
class ContainmentMixtureSpec extends SparkSpec {
  import spark.implicits._

  test("containmentPairs: an embedded eval doc scores ~1.0 where Jaccard would miss it") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // train doc 1 CONTAINS the bench doc verbatim inside much more text;
    // train doc 2 shares nothing
    val train = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 alpha beta gamma delta epsilon y1 y2 y3 y4 y5 y6 y7 y8"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.containmentPairs(train, bench, "text", "doc_id", n = 3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 100L)
    // bench has 3 trigram shingles, all present in train doc 1
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(3) == 1.0)
    // the symmetric Jaccard over the same shingles would be 3/(19+3) —
    // far below any dedup threshold; containment is the right measure
  }

  test("containmentPairs: threshold filters, partial overlap is fractional") {
    val bench = Seq((9L, "a b c d e f")).toDF("doc_id", "text") // 4 trigrams
    val train = Seq((1L, "a b c d zz")).toDF("doc_id", "text")  // shares 2 of 4
    val out = TextAnalysis.containmentPairs(train, bench, "text", "doc_id", n = 3)
      .collect()
    assert(out.head.getLong(2) == 2L && out.head.getDouble(3) == 0.5)
    assert(TextAnalysis.containmentPairs(
      train, bench, "text", "doc_id", n = 3, minContainment = 0.6).isEmpty)
  }

  test("unigramLm + lmCrossEntropy: in-distribution text scores lower than OOV text") {
    // LM corpus: heavily "the cat sat" flavored
    val lmCorpus = Seq.tabulate(10)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val (lm, oov) = TextAnalysis.unigramLm(lmCorpus, "text", vocab = 100)
    assert(lm.size == 5, "vocab: the/cat/sat/on/mat")
    // p(the) = 20/60; quantized nano-nats match floor(ln(p)*1e9 + 0.5)
    assert(lm("the") == math.floor(math.log(20.0 / 60) * 1e9 + 0.5).toLong)
    assert(oov == math.floor(math.log(1.0 / 60) * 1e9 + 0.5).toLong)

    val docs = Seq(
      (1L, "the cat sat"),           // fully in-vocab
      (2L, "zebra quark flux"),      // fully OOV
      (3L, "")                       // empty
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmCrossEntropy(docs, "text", "doc_id", lm, oov)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "cross_entropy")
      .as[(Long, Long, Double)].collect()
    assert(out(0)._3 < out(1)._3, "in-distribution < OOV")
    // OOV doc: every token at the floor => ce == -ln(1/60)
    assert(math.abs(out(1)._3 - (-math.log(1.0 / 60))) < 1e-6)
    assert(out(2) == ((3L, 0L, 0.0)))
    // scoring is map-only: no Exchange in the plan
    val plan = TextAnalysis.lmCrossEntropy(docs, "text", "doc_id", lm, oov)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("ceDiffSelect: Moore-Lewis diff ranks in-domain text head, off-domain tail") {
    // in-domain LM: "the cat sat" flavored; general LM: "stock market
    // report" flavored — a doc matching the in-domain register must get
    // a negative ce_in - ce_gen (head), the reverse a positive (tail)
    val inCorpus = Seq.tabulate(10)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val genCorpus = Seq.tabulate(10)(i => (i.toLong, "stock market report for the day"))
      .toDF("doc_id", "text")
    val (lmIn, oovIn) = TextAnalysis.unigramLm(inCorpus, "text", vocab = 100)
    val (lmGen, oovGen) = TextAnalysis.unigramLm(genCorpus, "text", vocab = 100)
    val docs = Seq(
      (1L, "the cat sat"),            // in-domain-like -> head
      (2L, "stock market report"),    // general-like   -> tail
      (3L, "")                        // empty          -> diff 0, middle
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ceDiffSelect(docs, "text", "doc_id",
        lmIn, oovIn, lmGen, oovGen, headLt = -0.5, tailGt = 0.5)
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(4) < -0.5 && out(0).getString(5) == "head",
      s"in-domain doc: diff=${out(0).getDouble(4)}")
    assert(out(1).getDouble(4) > 0.5 && out(1).getString(5) == "tail",
      s"general doc: diff=${out(1).getDouble(4)}")
    assert(out(2).getLong(1) == 0L && out(2).getDouble(4) == 0.0 &&
      out(2).getString(5) == "middle")
    // the diff comes from the integer sums, not the rounded ce's — but
    // it must agree with them to rounding error
    out.filter(_.getLong(1) > 0).foreach { r =>
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 2e-6)
    }
    // scoring is one map-only projection: no Exchange, no Join
    val plan = TextAnalysis.ceDiffSelect(docs, "text", "doc_id",
        lmIn, oovIn, lmGen, oovGen, -0.5, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"scoring must stay map-only:\n$plan")
  }

  test("ceDiffSelect: bucket is a pure function of the rounded diff") {
    val (lm, oov) = TextAnalysis.unigramLm(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "text", vocab = 10)
    val docs = Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.ceDiffSelect(docs, "text", "doc_id",
        lm, oov, lm, oov, headLt = -0.02, tailGt = 0.02)
      .collect()
    // identical models: diff is exactly 0.0 for every doc -> middle
    assert(out.forall(r => r.getDouble(4) == 0.0 && r.getString(5) == "middle"))
  }

  test("unigramLm: vocab cutoff is deterministic (count desc, token asc)") {
    val lmCorpus = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val (lm, _) = TextAnalysis.unigramLm(lmCorpus, "text", vocab = 2)
    assert(lm.keySet == Set("a", "b"), "tie at count 2 -> lexicographic; c cut")
  }

  test("bigramLm: conditional probs quantize from pair/unigram counts; backoff at ln 0.4") {
    val lmCorpus = Seq.tabulate(10)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val (bi, uni, oov, backoff) =
      TextAnalysis.bigramLm(lmCorpus, "text", vocab = 100, bigramVocab = 100)
    def q(p: Double) = math.floor(math.log(p) * 1e9 + 0.5).toLong
    assert(bi.size == 5, "the cat/cat sat/sat on/on the/the mat")
    // c("the cat")=10, c("the")=20 -> p = 1/2
    assert(bi("the cat") == q(10.0 / 20))
    assert(bi("on the") == q(10.0 / 10))
    assert(uni("the") == q(20.0 / 60))
    assert(oov == q(1.0 / 60) && backoff == q(0.4))
  }

  test("bigramCrossEntropy: tabled bigrams beat backoff; unseen pairs take penalty + unigram") {
    val lmCorpus = Seq.tabulate(10)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val (bi, uni, oov, backoff) =
      TextAnalysis.bigramLm(lmCorpus, "text", vocab = 100, bigramVocab = 100)
    val docs = Seq(
      (1L, "the cat sat"),   // both bigrams tabled
      (2L, "mat sat cat"),   // in-vocab words, no tabled bigram -> backoff
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(
        docs, "text", "doc_id", bi, uni, oov, backoff)
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 exact: uni(the) + bi(the cat) + bi(cat sat), 3 tokens
    val exp1 = -(uni("the") + bi("the cat") + bi("cat sat")).toDouble / 1e9 / 3
    assert(math.abs(out(0)._3 - r6(exp1)) < 1e-9)
    // doc 2 exact: uni(mat) + 2 backoff steps
    val exp2 = -(uni("mat") + (backoff + uni("sat")) + (backoff + uni("cat"))).toDouble / 1e9 / 3
    assert(math.abs(out(1)._3 - r6(exp2)) < 1e-9)
    assert(out(0)._3 < out(1)._3, "phrase-consistent text scores lower")
    assert(out(2) == ((3L, 0L, 0.0)))
    val plan = TextAnalysis.bigramCrossEntropy(
        docs, "text", "doc_id", bi, uni, oov, backoff)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be map-only:\n$plan")
  }

  test("stratifiedSample: budget per stratum, growth only adds below the cut") {
    val docs = (0L until 200L).map(i => (i, s"doc $i", if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val s1 = TextAnalysis.stratifiedSample(docs, "doc_id", "source", perStratum = 20)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(s1.count(_._2 == "a") == 20 && s1.count(_._2 == "b") == 20)
    // deterministic under repartitioning
    val s2 = TextAnalysis.stratifiedSample(docs.repartition(7), "doc_id",
        "source", perStratum = 20)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(s1 == s2)
    // a grown stratum keeps every previously-kept doc whose hash still
    // makes the cut — the kept set can only lose docs to NEW hash-lower
    // arrivals, never reshuffle among survivors: verify rank order of
    // survivors is preserved
    val grown = docs.unionByName((1000L until 1050L)
      .map(i => (i, s"doc $i", "a")).toDF("doc_id", "text", "source"))
    val g = TextAnalysis.stratifiedSample(grown, "doc_id", "source", 20)
      .filter(col("source") === "a")
      .orderBy(col("sample_rank"))
      .collect().map(_.getLong(0)).toSeq
    val old = TextAnalysis.stratifiedSample(docs, "doc_id", "source", 20)
      .filter(col("source") === "a")
      .orderBy(col("sample_rank"))
      .collect().map(_.getLong(0)).toSeq
    // survivors appear in the same relative (hash) order in both runs
    val survivors = old.filter(g.contains)
    assert(g.filter(survivors.contains) == survivors,
      "hash order of surviving docs is stable under corpus growth")
    // top-N is rank-limited inside the window (WindowGroupLimit), not a
    // full sort + filter
    val plan = TextAnalysis.stratifiedSample(docs, "doc_id", "source", 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-limit pushdown:\n$plan")
  }

  test("domainMixture: alpha<1 upsamples small domains; weights sum to ~1") {
    // 90 vs 10 tokens across two domains
    val docs = Seq(
      (1L, Seq.fill(90)("w").mkString(" "), "big"),
      (2L, Seq.fill(10)("w").mkString(" "), "small")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.domainMixture(docs, "text", "source", alpha = 0.5)
      .orderBy("source").collect()
    val big = out.find(_.getString(0) == "big").get
    val small = out.find(_.getString(0) == "small").get
    assert(big.getLong(1) == 1 && big.getLong(2) == 90L)
    assert(big.getDouble(3) == 0.9 && small.getDouble(3) == 0.1)
    // sqrt smoothing: 9.4868/(9.4868+3.1623) = 0.75, 0.25
    assert(math.abs(big.getDouble(4) - 0.75) < 1e-4)
    assert(math.abs(small.getDouble(4) - 0.25) < 1e-4)
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-5)
    // alpha = 1 degenerates to raw token shares
    val raw = TextAnalysis.domainMixture(docs, "text", "source", alpha = 1.0)
      .orderBy("source").collect()
    raw.foreach(r => assert(r.getDouble(3) == r.getDouble(4)))
  }

  test("epochMixPlan: hand-exact boost ppm; coin replay; repeats bounded by base/base+1") {
    // counts 4 vs 16: w_nano = 2e9 / 4e9, W = 6e9, N = 20 — single-floor
    //   A: boost = 1e6·2e9·20 // (6e9·4)  = 1666666 -> 1 or 2 repeats
    //   B: boost = 1e6·4e9·20 // (6e9·16) =  833333 -> 0 or 1 repeats
    val docs = ((1 to 4).map(i => (i.toLong, "aa")) ++
      (11 to 26).map(i => (i.toLong, "bb"))).toDF("doc_id", "lang")
    val out = TextAnalysis.epochMixPlan(docs, "lang", "doc_id", seed = 31)
      .select("doc_id", "lang", "boost_ppm", "n_repeats")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.filter(_._2 == "aa").forall(_._3 == 1666666L), out.toString)
    assert(out.filter(_._2 == "bb").forall(_._3 == 833333L), out.toString)
    // exact coin replay, no Spark
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { case (id, _, boost, reps) =>
      val coin = graft.expressions.HashExpressions
        .md5Long60(md, s"31|$id".getBytes) % 1000000L
      val want = boost / 1000000L + (if (coin < boost % 1000000L) 1L else 0L)
      assert(reps == want, s"doc $id: $reps vs $want")
    }
    // the mixture property: the rare lang repeats MORE per doc
    val avg = (l: String) => { val v = out.filter(_._2 == l); v.map(_._4).sum.toDouble / v.size }
    assert(avg("aa") > avg("bb"))
  }

  test("epochMixPlan on the real corpus: boost is monotone-inverse in share; totals match the exact coin replay") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val out = TextAnalysis.epochMixPlan(docs, "lang", "doc_id", seed = 31)
      .select("doc_id", "lang", "boost_ppm", "n_repeats")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == docs.count())
    val byLang = out.groupBy(_._2).map { case (l, v) =>
      (l, v.length, v.head._3, v.map(_._4).sum) }.toSeq.sortBy(_._2)
    // smaller share -> bigger (or equal) boost, and every lang repeats >= 0
    byLang.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 >= b._3, s"boost not inverse-monotone: $byLang")
    case _ => ()
    }
    // expected total per lang from the deterministic coins, exact
    val md = java.security.MessageDigest.getInstance("MD5")
    byLang.foreach { case (l, _, boost, total) =>
      val ids = out.filter(_._2 == l).map(_._1)
      val want = ids.map { id =>
        boost / 1000000L + (if (graft.expressions.HashExpressions
          .md5Long60(md, s"31|$id".getBytes) % 1000000L <
          boost % 1000000L) 1L else 0L)
      }.sum
      assert(total == want, s"lang $l: $total vs $want")
    }
  }
}
