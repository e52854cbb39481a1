package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string, as one compiled call per
  * row. The built-in formulation (`transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i, n)))`) dispatches an interpreted lambda
  * per shingle — measured as the dominant cost of the MinHash pipeline.
  * Here the whole tokenize/slice/join/dedup happens inside one eval call
  * (CodegenFallback is fine: the per-ROW overhead is negligible, it was
  * the per-ELEMENT lambda overhead that hurt).
  *
  * Semantics (must stay aligned with the DuckDB oracle CTEs in
  * graft.queries.DataQueries):
  *   tokens  = regex-split on \s+, empty strings dropped
  *   shingle = n consecutive tokens joined with a single space
  *   result  = distinct shingles; fewer than n tokens -> empty array
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any = {
    // lowercase INTERNALLY (Locale.ROOT, matching Spark's lower()):
    // the SQL-registered graft_word_shingles must produce the same
    // shingles as the engine's Dedup.wordShingles path — SimHashExpr
    // documents the same invariant. Callers that already lowered are
    // unaffected (lower is idempotent).
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT))
    val m = toks.length
    val count = m - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](count * 2)
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < count) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(j + k))
          k += 1
        }
        seen.add(sb.toString)
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var p = 0
      while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of whitespace tokens of lower(text) that appear in `words`.
  * One compiled pass (tokenize + hash-set membership); replaces the
  * interpreted `filter(toks, isInCollection)` higher-order chain that
  * dominated the text-profile bench. Token semantics identical to
  * [[graft.functions.GraftFunctions.tokens]] over lower(text).
  */
case class MarkerCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_marker_count"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
    var n = 0L
    var i = 0
    while (i < toks.length) {
      if (wordSet.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Language-ID over marker-word scores in ONE tokenize pass: argmax of
  * per-language function-word counts with first-in-list tie priority;
  * all-zero -> "und". Must stay aligned with the DuckDB oracle in
  * DataQueries.t01Sql (same lists, same >= tie rule).
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  require(markers.size <= 32,
    s"language membership is an Int bitmask: max 32 languages, got ${markers.size}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"

  @transient private lazy val wordToLang: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    markers.zipWithIndex.foreach { case ((_, ws), i) =>
      // a word may mark several languages (e.g. 'la' in es+fr): encode
      // membership as a bitmask
      ws.foreach { w =>
        val prev = m.getOrDefault(w, 0)
        m.put(w, prev | (1 << i))
      }
    }
    m
  }
  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  private val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
    val scores = new Array[Long](langs.length)
    var i = 0
    while (i < toks.length) {
      val mask = wordToLang.getOrDefault(toks(i), 0)
      if (mask != 0) {
        var l = 0
        while (l < scores.length) {
          if ((mask & (1 << l)) != 0) scores(l) += 1
          l += 1
        }
      }
      i += 1
    }
    var any = false
    var best = 0
    var l = 0
    while (l < scores.length) {
      if (scores(l) > 0) any = true
      // strict > keeps the EARLIER language on ties == the combinator's
      // ">= every other" priority chain
      if (scores(l) > scores(best)) best = l
      l += 1
    }
    if (!any) und else langs(best)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial token hash mod 1e9+7 in one compiled pass:
  * left fold of (acc * 31 + md5Long60(token) % M) % M over whitespace
  * tokens of lower(text). Twin of the DuckDB list_reduce oracle
  * (DataQueries.t03Sql).
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_rolling_hash"

  private val M = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val md = HashExpressions.localMd5.get()
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      val h = HashExpressions.md5Long60(md, toks(i).getBytes("UTF-8")) % M
      acc = (acc * 31L + h) % M
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document repetition statistics in ONE tokenize pass:
  * (n_tokens, n_distinct tokens, occurrences of the most frequent
  * token, occurrences of the most frequent word bigram) over whitespace
  * tokens of lower(text) — the inputs to Gopher-style repetition
  * quality signals (duplicate-token fraction, top-unigram/-bigram
  * fraction). Per-doc counting needs no cross-document data, so this
  * stays a map-only projection at any corpus size — no exploded token
  * shuffle, no per-element interpreted lambdas.
  *
  * Must stay aligned with the DuckDB oracle in DataQueries.t09Sql
  * (same tokens, bigrams joined with a single space).
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_token",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_bigram",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
    val m = toks.length
    val counts = new java.util.HashMap[String, Integer](m * 2)
    var topTok = 0L
    var i = 0
    while (i < m) {
      val prev = counts.get(toks(i))
      val c = if (prev == null) 1 else prev.intValue() + 1
      counts.put(toks(i), c)
      if (c > topTok) topTok = c
      i += 1
    }
    val bigrams = new java.util.HashMap[String, Integer](m * 2)
    var topBg = 0L
    i = 0
    while (i < m - 1) {
      val g = toks(i) + " " + toks(i + 1)
      val prev = bigrams.get(g)
      val c = if (prev == null) 1 else prev.intValue() + 1
      bigrams.put(g, c)
      if (c > topBg) topBg = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      m.toLong, counts.size.toLong, topTok, topBg)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher-rule inputs in ONE tokenize pass (Rae et al. 2021, Gopher
  * §A1.1.2 data pipeline): per document —
  * (n_tokens, sum_tok_len, n_alpha_toks, n_symbol_hits, n_lines,
  * n_bullet_lines, n_ellipsis_lines) over whitespace tokens of the RAW
  * text (token content is case-independent for every counted property;
  * stopword hits are a separate [[MarkerCountExpr]] which lowercases).
  * Lines split on \n; a bullet line starts with '-' or '*' after
  * space/tab trim; an ellipsis line ends with "..."; symbol hits count
  * '#' characters plus non-overlapping "..." occurrences anywhere.
  * Per-doc counting needs no cross-document data — map-only at any
  * corpus size. Must stay aligned with the DuckDB oracle
  * (DataQueries.t13Sql).
  */
case class GopherStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_tok_len",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_alpha_toks",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_symbol_hits",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_lines",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_bullet_lines",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_ellipsis_lines",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_gopher_stats"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = HashExpressions.tokenize(s)
    val nTok = toks.length.toLong
    var sumLen = 0L; var nAlpha = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      // CODE POINTS, not UTF-16 units: the DuckDB oracle's length(t)
      // counts code points, and a supplementary-plane char (emoji)
      // would otherwise count 2 here vs 1 there — mean_word_len and
      // pass_mean_len would hash-diverge
      sumLen += t.codePointCount(0, t.length)
      var j = 0; var alpha = false
      while (j < t.length && !alpha) {
        val c = t.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
        j += 1
      }
      if (alpha) nAlpha += 1
      i += 1
    }
    // symbol hits: '#' chars + non-overlapping "..." occurrences
    var nSym = 0L
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '#') { nSym += 1; i += 1 }
      else if (c == '.' && i + 2 < s.length &&
        s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') { nSym += 1; i += 3 }
      else i += 1
    }
    // line battery: split on \n (KEEP empty lines — a blank line is a
    // line; -1 limit keeps trailing empties, matching the oracle's
    // string_split on chr(10))
    val lines = s.split("\n", -1)
    val nLines = lines.length.toLong
    var nBullet = 0L; var nEllipsis = 0L
    i = 0
    while (i < lines.length) {
      val ln = lines(i)
      var st = 0
      while (st < ln.length && (ln.charAt(st) == ' ' || ln.charAt(st) == '\t')) st += 1
      if (st < ln.length && (ln.charAt(st) == '-' || ln.charAt(st) == '*')) nBullet += 1
      if (ln.length >= 3 && ln.endsWith("...")) nEllipsis += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nTok, sumLen, nAlpha, nSym, nLines, nBullet, nEllipsis)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bigram-LM document scoring with stupid-backoff in ONE tokenize pass
  * (the t11 unigram contract extended one order): token 0 scores
  * unigram; token i>0 scores the QUANTIZED conditional log-prob
  * ln(c(w_{i-1} w_i)/c(w_{i-1})) when the bigram is in the (driver-
  * built, literal) bigram table, else backoff-penalty + unigram(w_i).
  * All log-probs pre-quantized to integer nano-nats — the per-doc sum
  * is exact integer arithmetic, order-independent on any engine.
  * Returns (n_tokens, sum_logp_u). Twin of the DuckDB bigram-join
  * oracle (DataQueries.t14Sql).
  */
case class BigramLmScoreExpr(child: Expression,
                             bigramLogpU: Map[String, Long],
                             unigramLogpU: Map[String, Long],
                             oovLogpU: Long, backoffU: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_logp_u",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_bigram_lm_score"

  @transient private lazy val bi: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](bigramLogpU.size * 2)
    bigramLogpU.foreach { case (k, v) => m.put(k, v) }
    m
  }
  @transient private lazy val uni: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](unigramLogpU.size * 2)
    unigramLogpU.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def uniLp(t: String): Long = {
    val lp = uni.get(t)
    if (lp == null) oovLogpU else lp.longValue()
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
    val m = toks.length
    var sum = 0L
    if (m > 0) sum += uniLp(toks(0))
    var i = 1
    while (i < m) {
      val lp = bi.get(toks(i - 1) + " " + toks(i))
      sum += (if (lp != null) lp.longValue() else backoffU + uniLp(toks(i)))
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(m.toLong, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram-LM document scoring in ONE tokenize pass: per whitespace
  * token of lower(text), look up a QUANTIZED log-probability (scaled to
  * integer nano-nats: floor(ln(p)*1e9 + 0.5), out-of-vocabulary tokens
  * take `oovLogpU`) and return (n_tokens, Σ logp_u). Integer
  * accumulation makes the per-doc sum exact and order-independent — a
  * double Σ ln(p) would hash-diverge from the oracle on accumulation
  * order. The vocab map is a driver-built literal (bounded by the
  * vocab-size contract), so scoring is map-only at any corpus size.
  * Twin of the DuckDB vocab-join oracle (DataQueries.t11Sql).
  */
case class LmScoreExpr(child: Expression, logpU: Map[String, Long], oovLogpU: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_logp_u",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_lm_score"

  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](logpU.size * 2)
    logpU.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      val lp = lookup.get(toks(i))
      sum += (if (lp == null) oovLogpU else lp.longValue())
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(toks.length.toLong, sum)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit md5 hashes of every k-token span (ALL positions, duplicates
  * included — unlike [[WordShinglesExpr]]'s distinct set): result[p] =
  * md5Long of tokens p..p+k-1 of lower(text) joined with one space.
  * Fewer than k tokens -> empty array. One compiled call per row turns
  * span-occurrence generation into a map-only stage — the window/lead
  * formulation costs a per-doc_id shuffle+sort BEFORE any spans exist.
  * Twin of the DuckDB spans CTE (DataQueries.d12Sql).
  */
case class SpanHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2, s"span width must be >= 2, got $k")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_span_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT))
    val m = toks.length
    val count = m - k + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val md = HashExpressions.localMd5.get()
    val out = new Array[Long](count)
    val sb = new java.lang.StringBuilder(64)
    var p = 0
    while (p < count) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      out(p) = HashExpressions.md5Long60(md, sb.toString.getBytes("UTF-8"))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL k-token spans of lower(text) as strings — every position,
  * duplicates included (unlike [[WordShinglesExpr]]'s distinct set;
  * the string twin of [[SpanHashesExpr]]): result[p] = tokens p..p+k-1
  * joined with one space. Fewer than k tokens -> empty array. Used for
  * n-gram COUNTING (bigram LM builds), where multiplicity matters.
  */
case class WordSpansExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"span width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_spans"

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT))
    val m = toks.length
    val count = m - k + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(64)
    var p = 0
    while (p < count) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      out(p) = UTF8String.fromString(sb.toString)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined (rolling-hash anchor) segmentation of a document's
  * token stream, one compiled call per row — the segmentation primitive
  * of exact-substring dedup (Lee et al. 2021's unaligned-run family;
  * `TextAnalysis.exactSubstrDedup`). A position p (1 <= p <= m-w) is an
  * ANCHOR iff the 60-bit md5 of the w lowercased tokens starting at p
  * satisfies `h % stride == 0`; segment boundaries are {0} ∪ anchors ∪
  * {m}. Because the anchor test reads only the w tokens at p, two
  * documents sharing a token run place IDENTICAL boundaries inside it
  * (for anchors whose w-gram lies fully inside the run) regardless of
  * the run's offset in either document — the property that lets
  * whole-segment equality catch UNALIGNED duplicated runs, where the
  * fixed-width [[SpanHashesExpr]] family needs one row per token
  * position. Expected segment length ≈ stride tokens, so all downstream
  * exchanges carry ~m/stride rows per document.
  *
  * result[i] = (pos, len, h) of segment i: tokens pos..pos+len-1,
  * h = md5Long60 of the segment's lowercased tokens joined with one
  * space. Segmentation covers the document exactly (Σ len = m); no
  * tokens -> empty array. Twin of the DuckDB anchors/segments CTEs in
  * DataQueries.d14Sql.
  */
case class AnchorSegmentsExpr(child: Expression, w: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 2, s"anchor width must be >= 2, got $w")
  require(stride >= 2, s"stride must be >= 2, got $stride")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("len",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_anchor_segments"

  override def nullSafeEval(input: Any): Any = {
    val toks = HashExpressions.tokenize(
      input.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT))
    val m = toks.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val md = HashExpressions.localMd5.get()
    val sb = new java.lang.StringBuilder(64)
    // boundaries: 0, every anchor position, m
    val bnd = scala.collection.mutable.ArrayBuffer[Int](0)
    var p = 1
    while (p + w <= m) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      val h = HashExpressions.md5Long60(md, sb.toString.getBytes("UTF-8"))
      if (h % stride == 0) bnd += p
      p += 1
    }
    bnd += m
    val out = new Array[Any](bnd.length - 1)
    var i = 0
    while (i < bnd.length - 1) {
      val b = bnd(i); val nb = bnd(i + 1)
      sb.setLength(0)
      var t = b
      while (t < nb) {
        if (t > b) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      out(i) = org.apache.spark.sql.catalyst.InternalRow(b, nb - b,
        HashExpressions.md5Long60(md, sb.toString.getBytes("UTF-8")))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token-position removal + rebuild in ONE pass: tokenize text (RAW
  * case — removal positions were decided on lowercased hashes, rebuild
  * preserves the original tokens), drop the positions listed in
  * `removedPos` (any order, duplicates fine; NULL means none — a left
  * join miss), join survivors with single spaces. Returns
  * (n_tokens, n_kept, text_dedup); token-less text -> NULL so callers
  * can keep the token-bearing-docs contract with one filter.
  * Out-of-range positions are ignored (impossible by construction —
  * they come from this text's own span positions).
  */
case class DropTokensExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_kept",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("text_dedup", StringType,
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_drop_tokens"

  // NULL removedPos must still rebuild (BinaryExpression's default eval
  // would null the whole row), so eval is overridden directly
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) return null
    val toks = HashExpressions.tokenize(t.asInstanceOf[UTF8String].toString)
    val m = toks.length
    if (m == 0) return null
    val removed = new Array[Boolean](m)
    val r = right.eval(input)
    if (r != null) {
      val arr = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var j = 0
      while (j < arr.numElements()) {
        val p = arr.getInt(j)
        if (p >= 0 && p < m) removed(p) = true
        j += 1
      }
    }
    val sb = new java.lang.StringBuilder(64)
    var kept = 0L
    var p = 0
    while (p < m) {
      if (!removed(p)) {
        if (kept > 0) sb.append(' ')
        sb.append(toks(p))
        kept += 1
      }
      p += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(m.toLong, kept,
      UTF8String.fromString(sb.toString))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** BPE merge application over ONE word as a single compiled pass — the
  * production-scale encode kernel (VERDICT r11 next-#3). The literal
  * replace-chain ([[graft.operators.TextAnalysis.bpeSymbols]]) applies
  * every merge as its own expression node and full-string pass: at a
  * real 32k-50k merge table both the expression tree and the per-word
  * work explode linearly in the table size. Here the merge table lives
  * in the expression INSTANCE (one broadcast to executors, one
  * rank-lookup structure built lazily per JVM) and each word runs a
  * heap-driven simulation: only the ranks of pairs actually PRESENT in
  * the word are visited, so per-word cost is O(len · applied) —
  * independent of the table size.
  *
  * Semantics are EXACTLY the chain's (spec-pinned against it,
  * BpeSpec): merges apply once each, in rank order, as a left-to-right
  * non-overlapping single pass of " a b " -> " ab " over the
  * space-seeded symbol string. Two chain quirks are reproduced
  * faithfully:
  *  - the consumed-separator rule: a replace consumes the trailing
  *    space, so in " a b a b " the second (a,b) does NOT merge (its
  *    leading space is gone) — the scan models this by blocking the
  *    symbol immediately after a merge from STARTING a match;
  *  - duplicate merges: a pair can be re-learned at a later rank (its
  *    own pass can leave survivors via the rule above); each rank is
  *    its own pass, so the rank map carries ALL ranks per pair.
  *
  * Rank-order-once is honored by construction: a pair instance created
  * by the pass at rank r is (re)queued at its smallest rank > r —
  * earlier ranks' turns have passed and never re-fire.
  *
  * Returns the symbol array (count = size, string = array_join).
  * Reference behavior: nycitibike-data-transform has no tokenizer; the
  * contract mirrors the fit in TextAnalysis.scala (fitBpeDriver). */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  // pair "a b" -> ALL its ranks ascending (duplicates legal, see above)
  @transient private lazy val ranks: java.util.HashMap[String, Array[Int]] = {
    val tmp = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      tmp.computeIfAbsent(a + " " + b,
        _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += i
    }
    val m = new java.util.HashMap[String, Array[Int]](tmp.size * 2)
    tmp.forEach((k, v) => m.put(k, v.toArray)) // appended ascending
    m
  }

  // smallest rank of `key` strictly greater than `after`, or -1
  private def nextRank(key: String, after: Int): Int = {
    val rs = ranks.get(key)
    if (rs == null) -1
    else {
      var i = 0
      while (i < rs.length && rs(i) <= after) i += 1
      if (i < rs.length) rs(i) else -1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[UTF8String].toString
    var syms = {
      val cps = w.codePoints().toArray
      val a = new Array[String](cps.length)
      var i = 0
      while (i < cps.length) { a(i) = new String(Character.toChars(cps(i))); i += 1 }
      a
    }
    val heap = new java.util.PriorityQueue[Integer]()
    var i = 0
    while (i < syms.length - 1) {
      val r = nextRank(syms(i) + " " + syms(i + 1), -1)
      if (r >= 0) heap.add(r)
      i += 1
    }
    var lastApplied = -1
    while (!heap.isEmpty) {
      val r = heap.poll()
      if (r > lastApplied) {
        lastApplied = r
        val (a, b) = merges(r)
        val out = new Array[String](syms.length)
        var n = 0
        var j = 0
        var blocked = false
        var survivor = false
        var anyMerge = false
        // merge-output indices, to find newly-created neighbor pairs
        val mergedAt = new scala.collection.mutable.ArrayBuffer[Int](4)
        while (j < syms.length) {
          if (!blocked && j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out(n) = a + b
            mergedAt += n
            n += 1
            j += 2
            blocked = true
            anyMerge = true
          } else {
            if (syms(j) == a && j + 1 < syms.length && syms(j + 1) == b)
              survivor = true // blocked occurrence: may merge at a later rank
            out(n) = syms(j)
            n += 1
            j += 1
            blocked = false
          }
        }
        if (anyMerge) {
          syms = java.util.Arrays.copyOf(out, n)
          // requeue: survivors of THIS pair at its next rank, and the
          // new neighbor pairs each merge point created
          if (survivor) {
            val nr = nextRank(a + " " + b, r)
            if (nr >= 0) heap.add(nr)
          }
          mergedAt.foreach { p =>
            if (p > 0) {
              val nr = nextRank(syms(p - 1) + " " + syms(p), r)
              if (nr >= 0) heap.add(nr)
            }
            if (p + 1 < syms.length) {
              val nr = nextRank(syms(p) + " " + syms(p + 1), r)
              if (nr >= 0) heap.add(nr)
            }
          }
        }
      }
    }
    new GenericArrayData(syms.map(s => UTF8String.fromString(s)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Viterbi token count of ONE WORD under a unigram-LM piece model
  * (Kudo 2018, "Subword Regularization" — the SentencePiece unigram
  * family): pieces carry integer nano-nat COSTS (−ln p on the
  * t11/ExactLn grid, so ≥ 0), the best segmentation minimizes total
  * cost over pieces of length ≤ `maxPieceLen`, and a character absent
  * from the vocab segments as a single-char token at `oovCostU` (the
  * 1/total floor — t11's OOV convention). DETERMINISM CONTRACT, shared
  * with the unrolled-DP oracle (DataQueries t33): positions advance
  * left to right; at each end position j the candidate start indices i
  * are scanned ASCENDING and a candidate replaces the incumbent only
  * when STRICTLY cheaper — so on cost ties the smallest start (longest
  * piece) wins, which is exactly the oracle's
  * `row_number() OVER (ORDER BY cost, i)` rule. Integer cost sums:
  * no float enters the comparison. Code-point indexing matches DuckDB
  * substr semantics for non-BMP input. */
case class UnigramCountExpr(child: Expression, costsU: Map[String, Long],
                            oovCostU: Long, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(costsU.values.forall(_ >= 0L) && oovCostU >= 0L,
    "unigram costs are -ln p in nano-nats and must be non-negative")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_unigram_count"

  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](costsU.size * 2)
    costsU.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val cpsArr = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cpsArr.length
    if (n == 0) return 0L
    val chars = new Array[String](n)
    var c = 0
    while (c < n) {
      chars(c) = new String(Character.toChars(cpsArr(c))); c += 1
    }
    val INF = Long.MaxValue
    val best = Array.fill(n + 1)(INF)
    val tk = new Array[Long](n + 1)
    best(0) = 0L
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) != INF) {
          val sb = new java.lang.StringBuilder(j - i)
          var p = i
          while (p < j) { sb.append(chars(p)); p += 1 }
          val cu = lookup.get(sb.toString)
          val stepCost =
            if (cu != null) cu.longValue()
            else if (j - i == 1) oovCostU
            else -1L
          if (stepCost >= 0L) {
            val cand = best(i) + stepCost
            if (cand < best(j)) { best(j) = cand; tk(j) = tk(i) + 1 }
          }
        }
        i += 1
      }
      j += 1
    }
    tk(n)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WORDPIECE greedy longest-match-first segmentation of ONE word
  * (Wu et al. 2016 / BERT's tokenizer, the third production tokenizer
  * family next to BPE and the unigram LM): at each position take the
  * LONGEST vocab piece — the initial form at position 0, the
  * `##`-prefixed continuation form after — and advance; if NO piece
  * matches at some position the WHOLE word is the single [UNK] token
  * (BERT's all-or-nothing rule, not per-char OOV). Returns a struct
  * `(tk, unk)`: tk = piece count (1 for an [UNK] word, 0 for an empty
  * word), unk = 1 iff the word failed. DETERMINISM CONTRACT, shared
  * with the unrolled greedy oracle (DataQueries t36): longest-first is
  * scanned by DESCENDING length with no tie possible (one candidate
  * per length), and code-point indexing matches DuckDB substr
  * semantics for non-BMP input. Vocab pieces are stored WITH their
  * form marker (`##x` vs `x`), so one set holds both forms. */
case class WordpieceCountExpr(child: Expression, vocab: Set[String],
                              maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("tk",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("unk",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_wordpiece_count"

  @transient private lazy val lookup: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val cpsArr = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cpsArr.length
    if (n == 0)
      return org.apache.spark.sql.catalyst.InternalRow(0L, 0L)
    val chars = new Array[String](n)
    var c = 0
    while (c < n) {
      chars(c) = new String(Character.toChars(cpsArr(c))); c += 1
    }
    var pos = 0
    var tk = 0L
    while (pos < n) {
      var l = math.min(maxPieceLen, n - pos)
      var adv = 0
      while (l >= 1 && adv == 0) {
        val sb = new java.lang.StringBuilder(l + 2)
        if (pos > 0) sb.append("##")
        var p = pos
        while (p < pos + l) { sb.append(chars(p)); p += 1 }
        if (lookup.contains(sb.toString)) adv = l
        l -= 1
      }
      if (adv == 0) // BERT rule: any unmatchable position -> whole-word [UNK]
        return org.apache.spark.sql.catalyst.InternalRow(1L, 1L)
      tk += 1L
      pos += adv
    }
    org.apache.spark.sql.catalyst.InternalRow(tk, 0L)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def wordpieceCount(word: Column, vocab: Set[String],
                     maxPieceLen: Int): Column =
    Bridge.column(WordpieceCountExpr(Bridge.expression(word), vocab,
      maxPieceLen))
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(word), merges))
  def unigramCount(word: Column, costsU: Map[String, Long],
                   oovCostU: Long, maxPieceLen: Int): Column =
    Bridge.column(UnigramCountExpr(Bridge.expression(word), costsU,
      oovCostU, maxPieceLen))
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), n))
  def spanHashes(text: Column, k: Int): Column =
    Bridge.column(SpanHashesExpr(Bridge.expression(text), k))
  def anchorSegments(text: Column, w: Int, stride: Int): Column =
    Bridge.column(AnchorSegmentsExpr(Bridge.expression(text), w, stride))
  def dropTokens(text: Column, removedPos: Column): Column =
    Bridge.column(DropTokensExpr(
      Bridge.expression(text), Bridge.expression(removedPos)))
  def lmScore(text: Column, logpU: Map[String, Long], oovLogpU: Long): Column =
    Bridge.column(LmScoreExpr(Bridge.expression(text), logpU, oovLogpU))
  def bigramLmScore(text: Column, bigramLogpU: Map[String, Long],
                    unigramLogpU: Map[String, Long],
                    oovLogpU: Long, backoffU: Long): Column =
    Bridge.column(BigramLmScoreExpr(Bridge.expression(text),
      bigramLogpU, unigramLogpU, oovLogpU, backoffU))
  def gopherStats(text: Column): Column =
    Bridge.column(GopherStatsExpr(Bridge.expression(text)))
  def wordSpans(text: Column, k: Int): Column =
    Bridge.column(WordSpansExpr(Bridge.expression(text), k))
  def repetitionStats(text: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(text)))
  def markerCount(text: Column, words: Seq[String]): Column =
    Bridge.column(MarkerCountExpr(Bridge.expression(text), words))
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangIdExpr(Bridge.expression(text), markers))
  def rollingHash(text: Column): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(text)))
}
