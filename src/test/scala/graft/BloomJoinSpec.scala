package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** [[BloomJoin]] — the prefilter must never drop a matching fact row
  * (no false negatives), must actually reduce the fact side on selective
  * dims, and the reduced join must equal the plain join row-for-row. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every dim key passes its own bloom") {
    val keys = (1 to 5000).map(_.toLong).toDF("k")
    val bloom = BloomJoin.buildBloom(keys, "k", m = 1 << 14, kh = 3)
    val missed = keys.filter(!BloomJoin.mightContain(col("k"), bloom, 3))
      .count()
    assert(missed == 0L, s"$missed dim keys failed membership")
  }

  test("false-positive rate is in the expected band, not degenerate") {
    val dim = (1 to 2000).map(_.toLong).toDF("k")
    val bloom = BloomJoin.buildBloom(dim, "k", m = 1 << 14, kh = 3)
    // disjoint probe population
    val probes = (1000001 to 1020000).map(_.toLong).toDF("k")
    val fp = probes.filter(BloomJoin.mightContain(col("k"), bloom, 3))
      .count().toDouble / 20000.0
    // theory at n=2000, m=16384, k=3: ~2.7%; wide guard band
    assert(fp < 0.10, s"false-positive rate $fp is degenerate")
    assert(fp > 0.0, "zero FPs over 20k probes would be suspicious")
  }

  test("reduced join == plain join, and the prefilter actually reduces") {
    val fact = (1 to 20000).map(i => (i.toLong, (i % 997).toLong))
      .toDF("fid", "key")
    val dim = (0 to 996 by 13).map(k => (k.toLong, s"d$k")).toDF("dk", "name")
    val reduced = BloomJoin.bloomFilteredJoin(fact, dim, "key", "dk",
        m = 1 << 14, kh = 3)
      .select("fid", "key", "name")
    val plain = fact.join(dim, col("key") === col("dk"))
      .select("fid", "key", "name")
    assert(reduced.except(plain).isEmpty && plain.except(reduced).isEmpty)
    val bloom = BloomJoin.buildBloom(dim, "dk", 1 << 14, 3)
    val kept = fact.filter(BloomJoin.mightContain(col("key"), bloom, 3)).count()
    // 77 of 997 keys match (~7.7%); bloom + FPs must stay well under half
    assert(kept < 20000 / 2, s"prefilter kept $kept of 20000 — no reduction")
    assert(kept >= plain.select("fid").distinct().count())
  }

  test("bloomDeltaDedup verdict == plain anti-join on the real corpus") {
    import graft.operators.Dedup
    import graft.functions.GraftFunctions.fingerprint
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(4L)) === 0)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(8L)) === 3)
        .withColumn("doc_id", col("doc_id") + 3000000L))
    val out = Dedup.bloomDeltaDedup(history, batch, "text", "doc_id",
      m = 2048, kh = 3)
    // ground truth: exact fingerprint anti-join, independent of the bloom
    val histFps = history.select(fingerprint(col("text")).as("fp"))
      .distinct().as[String].collect().toSet
    val rows = out.collect()
    assert(rows.length == batch.count())
    rows.foreach { r =>
      val (fp, hit, isNew) = (r.getString(1), r.getBoolean(2), r.getBoolean(3))
      assert(isNew == !histFps.contains(fp),
        s"row ${r.getLong(0)}: is_new=$isNew disagrees with the anti-join")
      // the bloom contract: a duplicate may NEVER miss the bloom
      if (!isNew) assert(hit, s"false negative on ${r.getLong(0)}")
    }
    // at m=2048 the small bitset must exercise BOTH pruning and the
    // false-positive confirm path (measured 112 pruned / 13 FPs at
    // sf0.01 — guard only the qualitative shape here)
    assert(rows.exists(r => !r.getBoolean(2)), "nothing was bloom-pruned")
    assert(rows.exists(r => r.getBoolean(2) && r.getBoolean(3)),
      "no false positives at m=2048 — the confirm path is untested")
    assert(rows.exists(r => !r.getBoolean(3)),
      "the redelivered rows must be flagged as duplicates")
  }

  test("bloomDeltaDedup: only bloom passers reach the confirm join") {
    import graft.operators.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.filter(pmod(col("doc_id"), lit(4L)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(4L)) === 0)
    val opt = Dedup.bloomDeltaDedup(history, batch, "text", "doc_id",
        m = 2048, kh = 3)
      .queryExecution.optimizedPlan
    // exactly ONE join (the confirm join) — the pruned-misses branch is
    // a join-free projection in the union
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 1, s"expected 1 confirm join, got ${joins.size}")
    // and its probe side is gated on the materialized bloom verdict
    // (the gated batch is localCheckpointed, so the filter references
    // the bloom_hit column, not the inlined bitset probe), so bloom
    // misses never enter the join
    val gated = joins.head.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("bloom_hit") => f }
    assert(gated.nonEmpty, s"confirm join probe side is not bloom-gated:\n$opt")
  }

  test("NULL keys on either side match the plain-join contract") {
    // the plain equi-join drops null keys on both sides; the bloom
    // build must not NPE on them and the reduced join must still be
    // row-identical
    val fact = Seq((1L, Some(7L)), (2L, None), (3L, Some(8L)))
      .toDF("fid", "key")
    val dim = Seq((Some(7L), "a"), (None, "b")).toDF("dk", "name")
    val reduced = BloomJoin.bloomFilteredJoin(fact, dim, "key", "dk",
        m = 1 << 10, kh = 3)
      .select("fid", "key", "name")
    val plain = fact.join(dim, col("key") === col("dk"))
      .select("fid", "key", "name")
    assert(reduced.except(plain).isEmpty && plain.except(reduced).isEmpty)
    assert(reduced.count() == 1L)
  }
}
