package graft.operators

import graft.functions.GraftFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Explicit, deterministic bloom-filter semi-join reduction — the
  * classic distributed-DB "bloom join": build a bitset from the small
  * (dim) side's join keys, prefilter the big (fact) side MAP-ONLY before
  * its shuffle, then run the exact join on the survivors. At 100 TB this
  * is the difference between exchanging the whole fact table and
  * exchanging only the rows that can possibly match — the same idea as
  * Spark's AQE runtime bloom filter
  * (spark.sql.optimizer.runtime.bloomFilter.enabled), made explicit,
  * engine-independent (md5-hashed, no murmur), and false-negative-free
  * by construction, so the JOIN RESULT is bit-identical to the plain
  * join (the q53 oracle is exactly that plain join).
  */
object BloomJoin {

  /** Bloom bitset of a key column: `m` bits (m div 64 longs), `kh` hash
    * rows h_j(x) = md5Long(j|x) % m. Built distributed (explode kh bit
    * positions per key, bit-OR per 64-bit word) and collected — bounded
    * by construction at m/64 longs (1024 at m=2^16), the same literal
    * contract as the PQ codebooks. */
  def buildBloom(dim: DataFrame, keyCol: String, m: Int, kh: Int): Array[Long] = {
    require(m % 64 == 0 && m >= 64 && kh >= 1, s"m=$m kh=$kh")
    val posCols = (0 until kh).map { j =>
      pmod(md5Long(col(keyCol).cast(StringType), j), lit(m.toLong))
    }
    // NULL dim keys never match in the plain equi-join this operator is
    // result-identical to, so they contribute no bits (and md5Long(null)
    // would otherwise yield a null word group that NPEs at collect).
    val words = dim.filter(col(keyCol).isNotNull)
      .select(explode(array(posCols: _*)).as("pos"))
      .select(expr("pos div 64").as("w"),
        call_function("shiftleft", lit(1L),
          (col("pos") % 64).cast("int")).as("bit"))
      .groupBy("w").agg(bit_or(col("bit")).as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1))
    require(words.length <= m / 64, s"${words.length} words > ${m / 64}")
    val arr = new Array[Long](m / 64)
    words.foreach { case (w, bits) => arr(w) = bits }
    arr
  }

  /** Membership predicate against a literal bloom bitset: true iff every
    * hash row's bit is set — map-only, codegen-friendly (element_at on a
    * literal array + bitwise AND), no shuffle, no false negatives. */
  def mightContain(keyCol: Column, bloom: Array[Long], kh: Int): Column = {
    val m = bloom.length * 64
    val words = typedlit(bloom.toSeq)
    (0 until kh).map { j =>
      val pos = pmod(md5Long(keyCol.cast(StringType), j), lit(m.toLong))
      (element_at(words, call_function("shiftright", pos, lit(6)).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (pos % 64).cast("int")))) =!= 0L
    }.reduce(_ && _)
  }

  /** The reduced inner join: bloom-prefilter `fact` on `factKey`, then
    * exact-join to `dim`. Result == plain fact ⋈ dim (no false
    * negatives; false positives die in the exact join) — only the
    * exchanged volume changes. */
  def bloomFilteredJoin(fact: DataFrame, dim: DataFrame,
                        factKey: String, dimKey: String,
                        m: Int = 1 << 16, kh: Int = 3): DataFrame = {
    val bloom = buildBloom(dim, dimKey, m, kh)
    fact.filter(mightContain(col(factKey), bloom, kh))
      .join(dim, col(factKey) === col(dimKey))
  }
}
