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
