package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk) and decontamination (benchmark
  * n-gram overlap) — the t06/d09 training-data operators. */
class SeqPackDecontamSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: running totals chunk into capped sequences per shard") {
    // shard a: 3+4+5 = 12 tokens, cap 4 -> starts 0,3,7
    val docs = Seq(
      (1L, "w w w", "a"),
      (2L, "w w w w", "a"),
      (3L, "w w w w w", "a"),
      (4L, "w w", "b")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.packSequences(docs, "text", "doc_id", "lang", cap = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 0L, 0L),   // starts at token 0
      (2L, 4L, 0L, 3L),   // starts at 3, straddles into seq 1
      (3L, 5L, 1L, 3L),   // starts at 7 -> seq 7/4=1, offset 3
      (4L, 2L, 0L, 0L)))  // shard b restarts at 0
  }

  test("packSequences: NULL text keeps the row but contributes no tokens") {
    val docs = Seq((1L, Option("w w"), "a"), (2L, Option.empty[String], "a"),
      (3L, Option("w"), "a")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.packSequences(docs, "text", "doc_id", "lang", cap = 4)
      .orderBy("doc_id").collect()
    assert(out(1).isNullAt(out(1).fieldIndex("n_tokens")))
    // doc 3 starts at 2: the NULL doc added nothing to the running total
    assert(out(2).getLong(out(2).fieldIndex("seq_offset")) == 2L)
  }

  test("ngramOverlap: flags only docs sharing an n-gram, counts distinct shingles") {
    val train = Seq(
      (1L, "a b c d e"),        // shingles {a b c, b c d, c d e}
      (2L, "x y z q r"),        // no overlap
      (3L, "a b c a b c a b")). // distinct shingles {a b c, b c a, c a b}
      toDF("doc_id", "text")
    // bench shingles: {a b c, b c d, c d zz}
    val bench = Seq((100L, "a b c d zz")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramOverlap(train, bench, "text", "doc_id", n = 3)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)),
      "doc1 shares {a b c, b c d}; doc3's repeated 'a b c' counts once; " +
        "doc2 absent entirely")
  }
}
