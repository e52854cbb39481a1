package graft.expressions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row hash-sketch expressions for the dedup hot path.
  *
  * All three reproduce EXACTLY the md5-derived 60-bit hash used across
  * the engine and its DuckDB oracles ([[graft.functions.GraftFunctions
  * .md5Long]]): `conv(substr(md5(x),1,15),16,10)` = the first 15 hex
  * nibbles of the md5 digest as a non-negative long.
  *
  * Rationale (measured in round 1, PLANS.md): sketch signatures built
  * from built-ins need explode + aggregate — a full shuffle of exploded
  * token/shingle rows per sketch — or per-element interpreted lambdas.
  * One compiled call per ROW that loops tokens×bits (or shingles×seeds)
  * in tight JVM code turns signature computation into a map-only stage:
  * zero shuffles, and at 100 TB the sketch stage becomes embarrassingly
  * parallel over scan splits. CodegenFallback costs one virtual call per
  * row — noise next to the md5 work inside.
  */
object HashExpressions {

  /** First 15 hex nibbles of md5(bytes) as a non-negative long
    * (= first 8 digest bytes as big-endian u64, shifted right 4). */
  @inline def md5Long60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  val localMd5: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  // Explicit char class, NOT Java \s: Java \s includes vertical tab
  // (\x0B) but DuckDB's RE2 \s is exactly [\t\n\f\r ] — a corpus doc
  // containing \x0B would tokenize differently from the oracle's
  // string_split_regex('\s+') under Java semantics.
  private[expressions] val whitespace = Pattern.compile("[ \\t\\n\\f\\r]+")

  /** THE tokenizer every text expression shares: whitespace-split
    * (explicit RE2-parity class above) with empty tokens dropped —
    * the oracle-parity-critical semantics single-sourced, so a future
    * whitespace correction cannot silently miss one of the expression
    * copies. Case handling stays with the CALLER (some tokenize the
    * lowercased string, DropTokensExpr tokenizes raw). */
  private[expressions] def tokenize(s: String): Array[String] = {
    val raw = whitespace.split(s, -1)
    var m = 0
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) m += 1
      i += 1
    }
    if (m == raw.length) return raw
    val toks = new Array[String](m)
    var p = 0
    i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(p) = raw(i); p += 1 }
      i += 1
    }
    toks
  }

  // Column wrappers
  def simhash(text: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(text), bits))
  def phash(text: Column): Column =
    Bridge.column(PerceptualHashExpr(Bridge.expression(text)))
  def minhashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(shingles), k))
  def md5Min(strings: Column): Column =
    Bridge.column(Md5MinExpr(Bridge.expression(strings)))
  def md5Set(strings: Column): Column =
    Bridge.column(Md5SetExpr(Bridge.expression(strings)))
  def suffixOverlapBound(a: Column, b: Column, depth: Int): Column =
    Bridge.column(SuffixOverlapBoundExpr(
      Bridge.expression(a), Bridge.expression(b), depth))
}

/** PPJoin+ SUFFIX-FILTER overlap bound (Xiao et al., "Efficient
  * Similarity Joins for Near-Duplicate Detection", WWW'08 §4.3 /
  * TODS'11): an UPPER bound on |A ∩ B| for two SORTED DISTINCT Long
  * arrays, via depth-capped recursive partitioning — pick the median
  * of A's range, split B's range around it by binary search, recurse
  * on the two halves, and at the depth cap bound each fragment pair by
  * min(|a|, |b|).
  *
  * Lossless by induction: overlap(A,B) = overlap(A<m, B<m) +
  * overlap(A>m, B>m) + [m ∈ B], and min(|a|,|b|) >= overlap at the
  * leaves, so bound >= |A ∩ B| at every depth. A candidate pair whose
  * bound falls below the similarity threshold's required overlap can
  * therefore be pruned WITHOUT the exact intersection — the d25/d31
  * verify stage's knob for corpora where the prefix+positional filters
  * leave a candidate set that still dominates (VERDICT r14 next-#6).
  *
  * Cost: <= 2^depth leaf comparisons plus one binary search per split
  * — O(2^d + d·log n) per pair vs array_intersect's O(n) hash build;
  * pays when candidates >> true pairs (the measured trigger: the
  * ScaleProbe candidate/verify ratio).
  *
  * CodegenFallback: one virtual call per candidate pair — noise next
  * to the avoided intersections (the t03/d03 trade). */
case class SuffixOverlapBoundExpr(left: Expression, right: Expression,
                                  depth: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  require(depth >= 1, s"depth must be >= 1, got $depth")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_suffix_overlap_bound"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    bound(av, 0, av.numElements(), bv, 0, bv.numElements(), depth)
  }

  // bound on |a[aLo,aHi) ∩ b[bLo,bHi)| — both ranges sorted ascending
  private def bound(a: ArrayData, aLo: Int, aHi: Int,
                    b: ArrayData, bLo: Int, bHi: Int, d: Int): Long = {
    val la = aHi - aLo
    val lb = bHi - bLo
    if (la == 0 || lb == 0) return 0L
    if (d == 0) return math.min(la, lb).toLong
    val midIdx = aLo + la / 2
    val mid = a.getLong(midIdx)
    // first index in b[bLo,bHi) with b >= mid
    var lo = bLo
    var hi = bHi
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (b.getLong(m) < mid) lo = m + 1 else hi = m
    }
    val bHasMid = lo < bHi && b.getLong(lo) == mid
    val bRightLo = if (bHasMid) lo + 1 else lo
    bound(a, aLo, midIdx, b, bLo, lo, d - 1) +
      bound(a, midIdx + 1, aHi, b, bRightLo, bHi, d - 1) +
      (if (bHasMid) 1L else 0L)
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> children, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash of a text (lowercased internally, so the SQL-registered form
  * and the DataFrame path agree): whitespace-tokenize, md5 each token
  * occurrence (repeats vote repeatedly, matching the exploded
  * formulation), bit i of the 60-bit hash votes +1/-1, majority sign
  * sets bit i of the result. `bits` must be <= 60.
  *
  * Token-less text -> NULL (the exploded formulation produced no row
  * for such docs; NULL lets callers drop them and keeps two empty docs
  * from pairing at hamming 0).
  *
  * Oracle twin (DataQueries.d03Sql): votes CTE over unnested tokens.
  */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 60, s"simhash bits must be in [1,60], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val md = HashExpressions.localMd5.get()
    val s = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val votes = new Array[Int](bits)
    val toks = HashExpressions.tokenize(s)
    var t = 0
    while (t < toks.length) {
      val h = HashExpressions.md5Long60(md, toks(t).getBytes("UTF-8"))
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    if (toks.isEmpty) return null
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Perceptual (aHash-style) signature of DECODED media content — the
  * image-aHash structure applied to a 1-D payload: the content is split
  * into 60 equal POSITIONAL segments (the spatial blocks of image
  * aHash), and bit j is set when segment j's mean code point exceeds
  * the global mean. The comparison is the exact integer cross-multiply
  * segSum·L > totalSum·segLen — no doubles to diverge on. Similar
  * decoded payloads keep their content layout, so small edits shift
  * segment boundaries slightly and flip few bits; DIFFERENT payloads
  * differ block-wise and land far apart (a global histogram signature
  * measured here first paired 29% of a same-language corpus — spatial
  * structure is what discriminates, exactly as in images). 60 bits
  * keeps every shift inside a signed BIGINT in both engines (bit 63
  * would overflow DuckDB's `<<`).
  *
  * Empty content -> NULL (keeps empty payloads from all pairing at
  * hamming 0, the SimHashExpr contract).
  *
  * Oracle twin (MediaQueries.m07Sql): segment CTE over
  * (i·60)//length with ord(substr(text, i+1, 1)) — both engines walk
  * CODE POINTS with integer segment division.
  */
case class PerceptualHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_phash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    val L = s.codePointCount(0, s.length).toLong
    val segSum = new Array[Long](60)
    val segLen = new Array[Long](60)
    var totalSum = 0L
    var i = 0
    var idx = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val seg = ((idx * 60L) / L).toInt
      segSum(seg) += cp
      segLen(seg) += 1
      totalSum += cp
      idx += 1
      i += Character.charCount(cp)
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      // exact 128-bit compare of segSum·L vs totalSum·segLen: the
      // 64-bit products overflow beyond ~2e7 code points (segSum·L ~
      // L²·mean/60) while the DuckDB oracle's SUM promotes to HUGEINT —
      // multiplyHigh keeps both engines bit-identical at ANY payload
      // length (ADVICE r11)
      val hi1 = Math.multiplyHigh(segSum(j), L)
      val lo1 = segSum(j) * L
      val hi2 = Math.multiplyHigh(totalSum, segLen(j))
      val lo2 = totalSum * segLen(j)
      val gt =
        if (hi1 != hi2) hi1 > hi2
        else java.lang.Long.compareUnsigned(lo1, lo2) > 0
      if (gt) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-permutation minhash signature of a shingle array:
  * sig[s] = min over shingles of md5Long("s|" + shingle), s in [0,k).
  * Empty (or all-null-element) array -> null; null elements are
  * skipped (callers filter empty shingle sets upstream).
  *
  * Oracle twin (DataQueries.d02Sql): sig CTE with list_min/list_transform.
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"minhash k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty input array -> null result, independent of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  // UTF-8 bytes of the "<seed>|" prefixes, precomputed once per instance
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(s => s"$s|".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = HashExpressions.localMd5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null) { // null elements skipped, not NPE
        any = true
        val g = u.getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(prefixes(s))
          val d = md.digest(g)
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
          v = v >>> 4
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!any) return null
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minimum md5Long over a string array (single-band LSH bucket key).
  * Empty (or all-null-element) array -> null; null elements skipped.
  * Oracle twin: list_min(list_transform(sh, g -> h(g))).
  */
case class Md5MinExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  // empty input array -> null result, independent of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md5_min"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = HashExpressions.localMd5.get()
    var best = Long.MaxValue
    var any = false
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null) { // null elements skipped, not NPE
        any = true
        val h = HashExpressions.md5Long60(md, u.getBytes)
        if (h < best) best = h
      }
      i += 1
    }
    if (!any) return null
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct sorted md5Long60 hashes of a string array — the canonical
  * hashed-SET representation of a shingle array, built in one compiled
  * pass (the per-element `transform(sh, g -> md5Long(g))` lambda is
  * interpreted and re-dispatches per shingle — the MinHashSigExpr
  * lesson). Sorting makes the representation canonical (set equality ==
  * array equality) and ascending for merge-style consumers; a 60-bit
  * collision merges two shingles IDENTICALLY on both engines because
  * the oracle replays the same hash before its own distinct.
  * Null elements are skipped; a null array stays null; an array with
  * no non-null elements yields an EMPTY array (callers drop on size).
  *
  * Oracle twin: list_sort(list_distinct(list_transform(sh, g -> h60(g)))).
  */
case class Md5SetExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_set"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = HashExpressions.localMd5.get()
    // primitive buffer + sort + in-place dedup scan: zero boxing on the
    // per-shingle path (a TreeSet would allocate a boxed node per hash)
    val buf = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      if (u != null) { buf(m) = HashExpressions.md5Long60(md, u.getBytes); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(buf, 0, m)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    val out = new Array[Any](w)
    i = 0
    while (i < w) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** STUB TEXT-EMBEDDING as ONE expression — the
  * [[graft.multimodal.Multimodal.stubDecodeFeatures]] md5 arithmetic
  * over a string child, evaluated EXACTLY ONCE per row.
  *
  * Why an expression and not `transform(sequence(...), j -> ...)`: a
  * higher-order-function lambda re-evaluates every column it captures
  * PER ELEMENT, and higher-order functions are interpreted (no
  * whole-stage codegen, no common-subexpression elimination) — with a
  * derived input like a chunk-text slice, the 64-element column form
  * re-ran tokenize+slice+join+md5 64 times per row and made e22 a
  * 10.7 s query at sf0.1. This form evaluates the child once, hashes
  * once, and emits the feature array in a single pass (bench: 10.7 s
  * -> sub-second). CodegenFallback: one virtual call per row against
  * dim md5's of work — the t03/d03 trade, re-measured there. */
case class StubEmbedExpr(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 1, s"embedding dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_stub_embed"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = graft.multimodal.Multimodal.stubDecodeFeatures(bytes, dim)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
