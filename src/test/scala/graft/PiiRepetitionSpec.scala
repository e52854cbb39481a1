package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** PII profile/redaction (t08) and Gopher-style repetition signals
  * (t09) — the curation-filter operators. */
class PiiRepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("gopherProfile: each rule trips on its crafted violator") {
    val fiftyGood = (Seq.fill(12)("the cat sat with") ++ Seq("and", "end"))
      .mkString(" ") // 50 words, mean len in range, 12+ stopword hits
    val docs = Seq(
      (1L, fiftyGood),                                   // passes everything
      (2L, "too short but the and with stopwords"),      // fails word count
      (3L, (Seq.fill(25)("a b") ++ Seq.fill(13)("the with")).mkString(" ")), // mean len < 3 (76 words)
      (4L, fiftyGood + " " + Seq.fill(20)("###").mkString(" ")), // symbol ratio > 0.1
      (5L, (1 to 12).map(i => s"- bullet $i the with").mkString("\n")), // >90% bullet lines
      (6L, fiftyGood.split(" ").map(w => w + "...").mkString("\n")), // ellipsis lines
      (7L, (Seq.fill(48)("123 456") ++ Seq.fill(2)("the with")).mkString(" ")), // alpha < 0.8
      (8L, Seq.fill(50)("word").mkString(" "))           // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherProfile(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    def flag(r: org.apache.spark.sql.Row, name: String): Boolean =
      r.getBoolean(r.fieldIndex(name))
    assert(flag(out(0), "gopher_pass"), s"doc 1 must pass: ${out(0)}")
    assert(!flag(out(1), "pass_word_count") && !flag(out(1), "gopher_pass"))
    assert(!flag(out(2), "pass_mean_len"), s"mean_word_len=${out(2)}")
    assert(!flag(out(3), "pass_symbol"))
    assert(!flag(out(4), "pass_bullet"))
    assert(!flag(out(5), "pass_ellipsis"))
    assert(!flag(out(6), "pass_alpha"))
    assert(!flag(out(7), "pass_stop"))
  }

  test("filterAblation: n_fail and marginal n_only match a flag-level replay; shadowed rules report n_only 0") {
    val fiftyGood = (Seq.fill(12)("the cat sat with") ++ Seq("and", "end"))
      .mkString(" ")
    val docs = Seq(
      (1L, fiftyGood),                              // passes everything
      // 5 ### among 55 words: symbol 15/55 > 0.1 but alpha 50/55 >= 0.8
      (2L, fiftyGood + " " + Seq.fill(5)("###").mkString(" ")),  // symbol only
      (3L, Seq.fill(50)("word").mkString(" ")),     // stop only
      (4L, "short"),                                // word_count AND stop (short, no stopwords)
      (5L, fiftyGood + " " + Seq.fill(5)("###").mkString(" "))  // symbol only again
    ).toDF("doc_id", "text")
    val prof = TextAnalysis.gopherProfile(docs, "text", "doc_id")
    val out = TextAnalysis.filterAblation(prof)
      .select("rule", "n_fail", "n_only")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == TextAnalysis.gopherRuleNames.map(_._1).toSet)
    // flag-level sequential replay, no Spark
    val flags = prof.collect().map { r =>
      TextAnalysis.gopherRuleNames.map { case (_, c) =>
        !r.getBoolean(r.fieldIndex(c)) }
    }
    TextAnalysis.gopherRuleNames.map(_._1).zipWithIndex.foreach { case (rule, i) =>
      val nFail = flags.count(_(i))
      val nOnly = flags.count(f => f(i) && f.count(identity) == 1)
      assert(out(rule) == (nFail, nOnly), s"$rule: ${out(rule)} vs ($nFail,$nOnly)")
    }
    assert(out("symbol") == (2L, 2L))
    assert(out("stop")._2 == 1L)      // doc 3 alone; doc 4 shadowed by word_count
    assert(out("word_count")._2 == 0L) // doc 4 also fails stop -> not alone
  }

  test("gopherProfile: map-only plan; empty text yields zeroed fields") {
    val docs = Seq((1L, ""), (2L, "the cat with and of that be to have sat"))
      .toDF("doc_id", "text")
    val df = TextAnalysis.gopherProfile(docs, "text", "doc_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val r = df.orderBy("doc_id").collect()(0)
    assert(r.getLong(r.fieldIndex("n_words")) == 0L)
    assert(r.getDouble(r.fieldIndex("mean_word_len")) == 0.0)
    assert(!r.getBoolean(r.fieldIndex("gopher_pass")))
  }

  test("piiProfile: detects and redacts emails, phones, IPv4s") {
    val docs = Seq(
      (1L, "mail alice.smith+x@sub.example.org and bob@ex.io now"),
      (2L, "call 555-123-4567 or 555 987 6543 today"),
      (3L, "host 192.168.1.10 gateway 10.0.0.1"),
      (4L, "clean text with no identifiers at all"),
      (5L, "mixed a@b.co 555-000-1111 127.0.0.1 end")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiProfile(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 0 && out(0).getLong(3) == 0)
    assert(out(0).getString(4) == "mail <EMAIL> and <EMAIL> now")
    assert(out(1).getLong(2) == 2, "both separator styles")
    assert(out(1).getString(4) == "call <PHONE> or <PHONE> today")
    assert(out(2).getLong(3) == 2)
    assert(out(2).getString(4) == "host <IP> gateway <IP>")
    assert(out(3).getLong(1) == 0 && out(3).getLong(2) == 0 && out(3).getLong(3) == 0)
    assert(out(3).getString(4) == "clean text with no identifiers at all")
    assert(out(4).getString(4) == "mixed <EMAIL> <PHONE> <IP> end")
  }

  test("piiProfile: version strings and bare numbers are not IPs/phones") {
    val docs = Seq(
      (1L, "version 1.2.3 is out"),          // 3 octets, not 4
      (2L, "id 1234567890 plain digits"),    // no separators
      (3L, "semver 1.2.3.4 IS an ipv4 shape") // documented false positive
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiProfile(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(3) == 0 && out(1).getLong(2) == 0 && out(1).getLong(3) == 0)
    assert(out(2).getLong(3) == 1)
  }

  test("repetitionProfile: fractions match hand-computed counts") {
    val docs = Seq(
      (1L, "a a a a"),            // 4 tokens, 1 distinct, top tok 4, top bg "a a" x3
      (2L, "a b a b a"),          // 5 toks, 2 distinct, top tok 3, bgs: ab,ba,ab,ba -> top 2 of 4
      (3L, "w x y z"),            // all distinct, all bigrams unique
      (4L, "solo"),               // 1 token, no bigrams
      (5L, "")                    // empty -> all zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs, "text", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_token_frac", "top_bigram_frac")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out(0) == ((1L, 4L, 0.75, 1.0, 1.0)))
    assert(out(1) == ((2L, 5L, 0.6, 0.6, 0.5)))
    assert(out(2) == ((3L, 4L, 0.0, 0.25, 1.0 / 3.0)))
    assert(out(3) == ((4L, 1L, 0.0, 1.0, 0.0)))
    assert(out(4) == ((5L, 0L, 0.0, 0.0, 0.0)))
  }

  test("repetitionProfile: case-insensitive tokens; map-only plan (no Exchange)") {
    val docs = Seq((1L, "The THE the")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(docs, "text", "doc_id").head
    assert(out.getDouble(out.fieldIndex("top_token_frac")) == 1.0)
    // per-doc stats must stay a map-only projection at any corpus size
    val plan = TextAnalysis.repetitionProfile(
      graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents,
      "text", "doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val piiPlan = TextAnalysis.piiProfile(
      graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents,
      "text", "doc_id").queryExecution.executedPlan.toString
    assert(!piiPlan.contains("Exchange"), s"unexpected shuffle:\n$piiPlan")
  }
}
