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

  test("packSequences invariants on the real corpus, stable under repartitioning") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val cap = 128
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.packSequences(df, "text", "doc_id", "lang", cap)
        .orderBy("doc_id").collect().toSeq
    val out = run(docs)
    assert(out.nonEmpty)
    // offsets always inside a sequence
    assert(out.forall { r =>
      val off = r.getLong(r.fieldIndex("seq_offset")); off >= 0 && off < cap })
    // within a shard, (seq_id, seq_offset) is the running token total:
    // recompute it row-by-row in doc_id order and compare
    out.groupBy(r => Option(r.getString(r.fieldIndex("lang")))).foreach {
      case (_, rows) =>
        var cum = 0L
        rows.sortBy(_.getLong(0)).foreach { r =>
          assert(r.getLong(r.fieldIndex("seq_id")) == cum / cap)
          assert(r.getLong(r.fieldIndex("seq_offset")) == cum % cap)
          if (!r.isNullAt(r.fieldIndex("n_tokens")))
            cum += r.getLong(r.fieldIndex("n_tokens"))
        }
    }
    // the layout is a pure function of the data — any input partitioning
    // (13-way here vs the scan's) must produce the identical packing
    assert(run(docs.repartition(13)) == out,
      "packing must be partitioning-invariant")
  }

  test("ngramOverlap: counts bounded by each side's shingle count; partitioning-invariant") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val isBench = pmod(graft.functions.GraftFunctions.md5Long(
      col("doc_id").cast("string")), lit(100L)) < 10L
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.ngramOverlap(df.filter(!isBench), df.filter(isBench),
        "text", "doc_id", n = 3).orderBy("doc_id").collect().toSeq
    val out = run(docs)
    assert(out.nonEmpty, "the corpus has near-dups; overlap must be non-empty")
    val shingleCounts = docs
      .select(col("doc_id"), size(graft.operators.Dedup.wordShingles(col("text"), 3)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.forall { r =>
      r.getLong(r.fieldIndex("n_shared_shingles")) <= shingleCounts(r.getLong(0)) },
      "a doc cannot share more shingles than it has")
    assert(run(docs.repartition(7)) == out)
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

  private def runSpanDedup(df: org.apache.spark.sql.DataFrame, k: Int) =
    TextAnalysis.spanDedup(df, "text", "doc_id", k)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "text_dedup")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("spanDedup: keep-first removal, overlap union, short docs untouched") {
    val docs = Seq(
      (1L, "a b c d e"),          // keeper of the duplicated span "b c d"
      (2L, "x b c d y"),          // loses positions 1-3 (span b c d)
      (3L, "b c d"),              // exact dup span, fully removed
      (4L, "p q r s t"),          // no duplicated span: untouched
      (5L, "x b c d e f"))        // "x b c" (keeper doc2), "b c d" and
      .toDF("doc_id", "text")     //   "c d e" (keeper doc1) union to 0-4
    val out = runSpanDedup(docs, k = 3)
    assert(out == Seq(
      (1L, 5L, 5L, "a b c d e"),
      (2L, 5L, 2L, "x y"),        // keeper of "x b c", loses "b c d"
      (3L, 3L, 0L, ""),
      (4L, 5L, 5L, "p q r s t"),
      (5L, 6L, 1L, "f")))
  }

  test("spanDedup: within-doc repeats are kept; case-insensitive matching rebuilds original case") {
    val docs = Seq(
      (1L, "m n o m n o"),   // internal repeat only -> kept whole
      (2L, "A B C z"),       // case-variant of doc3's span
      (3L, "a b c w"))       // loses "a b c" to doc2 (lowercased hash match)
      .toDF("doc_id", "text")
    val out = runSpanDedup(docs, k = 3)
    assert(out == Seq(
      (1L, 6L, 6L, "m n o m n o"),
      (2L, 4L, 4L, "A B C z"),    // keeper, ORIGINAL case preserved
      (3L, 4L, 1L, "w")))
  }

  test("ngramOverlapShuffle == ngramOverlap (broadcast) on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Vector("red", "blue", "ox", "fox", "jumps", "runs", "tree",
      "mole", "vex", "quiz")
    val docs = (1L to 120L).map { i =>
      i -> Seq.fill(6 + rnd.nextInt(12))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bc = m(TextAnalysis.ngramOverlap(train, bench, "text", "doc_id", 3))
    val sh = m(TextAnalysis.ngramOverlapShuffle(train, bench, "text",
      "doc_id", 3))
    assert(bc.nonEmpty && sh == bc,
      s"shuffle plan must reproduce the broadcast results: ${sh.size}/${bc.size}")
  }

  test("spanDedup: partitioning-invariant and null/empty docs absent") {
    val docs = Seq(
      (1L, Option("a b c d e")), (2L, Option("z a b c d")),
      (3L, Option.empty[String]), (4L, Option("")))
      .toDF("doc_id", "text")
    val out = runSpanDedup(docs, k = 4)
    assert(out.map(_._1) == Seq(1L, 2L),
      "null/empty docs have no tokens and are absent by contract")
    assert(runSpanDedup(docs.repartition(7), k = 4) == out)
  }

  // ---------------------------------------------------------------
  // packFirstFitDecreasing (t25) — no-split FFD bin packing
  // ---------------------------------------------------------------

  private def txt(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("packFFD: hand-checked first-fit-decreasing placement with bin offsets") {
    // sizes 84,68,52,36,20,10 at cap 128 (one shard):
    // 84->bin0@0 [84]; 68->bin1@0 [84,68]; 52->bin1@68 [84,120];
    // 36->bin0@84 [120,120]; 20->bin2@0; 10->bin2@20 [.,.,30]
    val docs = Seq((1L, txt(84)), (2L, txt(68)), (3L, txt(52)),
      (4L, txt(36)), (5L, txt(20)), (6L, txt(10)))
      .toDF("doc_id", "text").withColumn("shard", lit("s"))
    val out = TextAnalysis
      .packFirstFitDecreasing(docs, "text", "doc_id", "shard", cap = 128L)
      .select("doc_id", "n_tokens", "bin_id", "bin_off")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 84L, 0L, 0L), (2L, 68L, 1L, 0L),
      (3L, 52L, 1L, 68L), (4L, 36L, 0L, 84L), (5L, 20L, 2L, 0L),
      (6L, 10L, 2L, 20L)), out.toString)
  }

  test("packFFD: oversize doc gets its own bin; no other doc joins it; NULL text packs as 0") {
    val docs = Seq((1L, Option(txt(200))), (2L, Option(txt(100))),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text").withColumn("shard", lit("s"))
    val out = TextAnalysis
      .packFirstFitDecreasing(docs, "text", "doc_id", "shard", cap = 128L)
      .select("doc_id", "n_tokens", "bin_id", "bin_off")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // 200 opens bin 0 (overfull); 100 cannot join -> bin 1; NULL=0
    // fits bin 1 at offset 100 (bin 0 is already over cap)
    assert(out == Seq((1L, 200L, 0L, 0L), (2L, 100L, 1L, 0L),
      (3L, 0L, 1L, 100L)), out.toString)
  }

  test("packFFD invariants on the real corpus: capped multi-doc bins, FFD property, partitioning-invariant") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
      .withColumn("shard",
        pmod(graft.functions.GraftFunctions
          .md5Long(col("doc_id").cast(org.apache.spark.sql.types.StringType)),
          lit(8L)).cast(org.apache.spark.sql.types.StringType))
    val cap = 128L
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.packFirstFitDecreasing(df, "text", "doc_id", "shard", cap)
        .select("shard", "doc_id", "n_tokens", "bin_id", "bin_off")
        .as[(String, Long, Long, Long, Long)].collect()
        .sortBy(t => (t._1, t._2)).toSeq
    val out = run(docs)
    assert(out.nonEmpty)
    // every multi-doc bin holds within capacity
    val byBin = out.groupBy(t => (t._1, t._4))
    byBin.foreach { case ((sh, b), ds) =>
      assert(ds.size == 1 || ds.map(_._3).sum <= cap,
        s"bin ($sh,$b) overfull with ${ds.size} docs: ${ds.map(_._3).sum}") }
    // offsets tile each bin contiguously from 0: sorted by offset, each
    // doc starts exactly where the previous one ended
    byBin.foreach { case ((sh, b), ds) =>
      var expect = 0L
      ds.sortBy(_._5).foreach { t =>
        assert(t._5 == expect, s"bin ($sh,$b): doc ${t._2} at off ${t._5}, expected $expect")
        expect += t._3 } }
    // bin ids are contiguous from 0 per shard
    out.groupBy(_._1).foreach { case (sh, ds) =>
      val bins = ds.map(_._4).distinct.sorted
      assert(bins == (0L until bins.size).toSeq, s"shard $sh bins: $bins") }
    // FFD property: replay the reference packer per shard and compare
    out.groupBy(_._1).foreach { case (sh, ds) =>
      val ordered = ds.map(t => (t._2, t._3)).sortBy { case (id, n) => (-n, id) }
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      val ref = ordered.map { case (id, n) =>
        var b = 0
        while (b < fills.length && fills(b) + n > cap) b += 1
        val off = if (b == fills.length) { fills += n; 0L }
                  else { val o = fills(b); fills(b) += n; o }
        id -> (b.toLong, off)
      }.toMap
      ds.foreach { t => assert((t._4, t._5) == ref(t._2),
        s"shard $sh doc ${t._2}: got ${(t._4, t._5)}, FFD reference ${ref(t._2)}") }
    }
    // invariant to input partitioning
    assert(run(docs.repartition(7)) == out)
  }

  test("packFFD: exactly one exchange, keyed by the shard column") {
    val docs = Seq((1L, txt(5), "a"), (2L, txt(6), "b"))
      .toDF("doc_id", "text", "shard")
    val plan = TextAnalysis
      .packFirstFitDecreasing(docs, "text", "doc_id", "shard", 128L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  // ---------------------------------------------------------------
  // boilerplateFilter (t26) — corpus-frequent segment removal
  // ---------------------------------------------------------------

  test("boilerplate: hand-checked df-3 drop, reconstruction, all-dropped and tail-segment docs") {
    val docs = Seq(
      (1L, "a b c d e f g h"),  // "a b c d" df=4 (drop), "e f g h" df=2 (keep)
      (2L, "a b c d x y z w"),
      (3L, "a b c d e f g h"),
      (4L, "p q r s"),          // unique, kept
      (5L, "a b c d"),          // every segment drops -> clean_text ''
      (6L, "m n o")             // 3-token tail segment, kept
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .boilerplateFilter(docs, "text", "doc_id", segTokens = 4, minDocFreq = 3)
      .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 4L, "e f g h"),
      (2L, 2L, 1L, 4L, "x y z w"),
      (3L, 2L, 1L, 4L, "e f g h"),
      (4L, 1L, 0L, 4L, "p q r s"),
      (5L, 1L, 1L, 0L, ""),
      (6L, 1L, 0L, 3L, "m n o")), out.toString)
  }

  test("boilerplate on the real corpus: matches an independent sequential replay; partitioning-invariant; no cartesian") {
    val docsDf = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    def run(df: org.apache.spark.sql.DataFrame) = TextAnalysis
      .boilerplateFilter(df, "text", "doc_id", segTokens = 4, minDocFreq = 3)
      .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val out = run(docsDf)
    assert(out.nonEmpty)
    // sequential reference replay, no Spark involved
    val raw = docsDf.select(col("doc_id"),
        coalesce(col("text"), lit("")).cast("string"))
      .as[(Long, String)].collect().toSeq
    val segsOf = (t: String) => t.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).grouped(4).map(_.mkString(" ")).toVector
    val df3 = raw.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val ref = raw.flatMap { case (id, t) =>
      val segs = segsOf(t)
      if (segs.isEmpty) None else {
        val kept = segs.filter(df3(_) < 3)
        Some((id, segs.size.toLong, (segs.size - kept.size).toLong,
          kept.map(_.split(" ").length.toLong).sum, kept.mkString(" ")))
      }
    }.sortBy(_._1)
    assert(out == ref, s"first diff: ${out.zip(ref).find(p => p._1 != p._2)}")
    assert(run(docsDf.repartition(7)) == out)
    val plan = TextAnalysis
      .boilerplateFilter(docsDf, "text", "doc_id", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ---------------------------------------------------------------
  // segmentDedupFirst (d24) — CCNet keep-first segment dedup
  // ---------------------------------------------------------------

  test("segment dedup: first occurrence keeps, later copies drop; exact-dup doc empties; within-doc repeat drops") {
    val docs = Seq(
      (1L, "a b c d e f g h"),  // keeper of both segments
      (2L, "a b c d x y z w"),  // "a b c d" drops (doc 1 keeps it)
      (3L, "a b c d e f g h"),  // exact dup of 1 -> ''
      (4L, "p q r s p q r s"),  // within-doc repeat: 2nd segment drops
      (5L, "m n o")             // unique tail segment, kept
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .segmentDedupFirst(docs, "text", "doc_id", segTokens = 4)
      .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2L, 0L, 8L, "a b c d e f g h"),
      (2L, 2L, 1L, 4L, "x y z w"),
      (3L, 2L, 2L, 0L, ""),
      (4L, 2L, 1L, 4L, "p q r s"),
      (5L, 1L, 0L, 3L, "m n o")), out.toString)
  }

  test("segment dedup vs boilerplate: one copy of every distinct segment survives corpus-wide; partitioning-invariant; no window sort on the keeper branch") {
    val docsDf = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    def run(df: org.apache.spark.sql.DataFrame) = TextAnalysis
      .segmentDedupFirst(df, "text", "doc_id", segTokens = 4)
      .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val out = run(docsDf)
    assert(out.nonEmpty)
    // CCNet invariant: total kept tokens == one copy of every distinct
    // segment's tokens (keep-first preserves each segment's mass ONCE).
    // Keeper = FIRST occurrence in (doc_id, chunk_idx) order, so the
    // replay must fold in ascending doc_id (collect order is arbitrary).
    val raw = docsDf.select(col("doc_id"),
        coalesce(col("text"), lit("")).cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val segsOf = (t: String) => t.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).grouped(4).map(_.mkString(" ")).toVector
    val allSegs = raw.flatMap { case (_, t) => segsOf(t) }
    val distinctMass = allSegs.distinct
      .map(_.split(" ").length.toLong).sum
    assert(out.map(_._4).sum == distinctMass)
    assert(out.map(_._2).sum == allSegs.size.toLong)
    // first-occurrence replay, no Spark involved
    val seen = scala.collection.mutable.HashSet.empty[String]
    val ref = raw.flatMap { case (id, t) =>
      val segs = segsOf(t)
      if (segs.isEmpty) None else {
        val kept = segs.filter(seen.add)
        Some((id, segs.size.toLong, (segs.size - kept.size).toLong,
          kept.map(_.split(" ").length.toLong).sum, kept.mkString(" ")))
      }
    }.sortBy(_._1)
    assert(out == ref, s"first diff: ${out.zip(ref).find(p => p._1 != p._2)}")
    assert(run(docsDf.repartition(7)) == out)
    val plan = TextAnalysis
      .segmentDedupFirst(docsDf, "text", "doc_id", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the keeper branch must be a partial-aggregable min, not a window
    assert(!plan.contains("Window"), plan)
  }

  // ---------------------------------------------------------------
  // segmentDedupDelta (d27) — streaming-CCNet keep-first across ticks
  // ---------------------------------------------------------------

  private def emptyRegistry = Seq.empty[Long].toDF("seg_h")

  test("segment delta: registry hit drops, within-batch keep-first, registry grows by first occurrences only") {
    val ref = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val seen = graft.operators.TextAnalysis
      .tokenWindowChunks(ref, "text", "doc_id", 4, 4)
      .select(graft.functions.GraftFunctions
        .md5Long(col("chunk_text")).as("seg_h")).distinct()
    val batch = Seq(
      (10L, "a b c d w x y z"),  // 1st seg in registry -> drops
      (11L, "w x y z p q r s"),  // "w x y z" kept in 10 -> drops here
      (12L, "a b c d")           // fully in registry -> ''
    ).toDF("doc_id", "text")
    val (cleaned, newSegs) = graft.operators.TextAnalysis
      .segmentDedupDelta(batch, "text", "doc_id", 4, seen)
    val out = cleaned
      .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, 2L, 1L, 4L, "w x y z"),
      (11L, 2L, 1L, 4L, "p q r s"),
      (12L, 1L, 1L, 0L, "")), out.toString)
    // new registry rows: exactly the batch's first-occurrence hashes
    assert(newSegs.count() == 2) // "w x y z" and "p q r s"
    assert(newSegs.join(seen, Seq("seg_h")).count() == 0,
      "registry hashes must not re-enter")
  }

  test("segment delta fold over id-ordered ticks from an empty registry == the static keep-first") {
    val docs = graft.catalog.Catalog(spark, "/root/testdata/sf0.001").documents
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val ticks = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))
    var seen = emptyRegistry
    val folded = ticks.flatMap { t =>
      val (cleaned, newSegs) = graft.operators.TextAnalysis
        .segmentDedupDelta(t, "text", "doc_id", 4, seen)
      // materialize BEFORE the registry advances (a tick's output must
      // not see later state through lazy evaluation)
      val rows = cleaned
        .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
        .as[(Long, Long, Long, Long, String)].collect().toSeq
      seen = seen.unionByName(newSegs).distinct().localCheckpoint(true)
      rows
    }.sortBy(_._1)
    val static = graft.operators.TextAnalysis
      .segmentDedupFirst(docs, "text", "doc_id", 4)
      .select("doc_id", "n_segments", "n_dropped", "n_toks_kept", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(folded == static,
      s"first diff: ${folded.zip(static).find(p => p._1 != p._2)}")
  }
}
