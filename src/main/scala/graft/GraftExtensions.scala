package graft

import graft.expressions.{CosineSimilarityExpr, DotProductExpr,
  GopherStatsExpr, Md5MinExpr, MinHashSigExpr, RepetitionStatsExpr,
  SimHashExpr, SpanHashesExpr, WordShinglesExpr, WordSpansExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Acos, Add, Cast, Conv, Cos,
  Expression, ExpressionInfo, Greatest, Least, Literal, Md5, Multiply, Sin,
  Substring, Subtract, ToRadians}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Sum}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DecimalType, DoubleType, LongType, StringType}

/** SparkSessionExtensions entry point: registers the graft custom
  * expressions as SQL functions, so SQL users get the same codegen'd
  * kernels the DataFrame API uses:
  *
  *   spark.sql("SELECT graft_cosine(a, b) FROM vecs")
  *   spark.sql("SELECT graft_word_shingles(text, 3) FROM docs")
  *
  * Wire-up (either way):
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (ident, i, b) => ext.injectFunction((ident, i, b)) }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def castToDoubleArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  /** Contract arity error instead of IndexOutOfBoundsException when a
    * SQL call passes the wrong argument count (ADVICE r4). */
  private def arity(children: Seq[Expression], n: Int, name: String): Unit =
    require(children.length == n,
      s"$name takes $n argument${if (n == 1) "" else "s"}, got ${children.length}")

  private def intLit(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays"),
      // explicit Cast to array<double>, matching the DataFrame wrappers:
      // a raw float array passed through would read 8-byte strides over
      // 4-byte elements (checkInputDataTypes would reject it; the Cast
      // makes the documented `graft_cosine(a, b)` on float embeddings
      // just work)
      (children: Seq[Expression]) => { arity(children, 2, "graft_cosine"); CosineSimilarityExpr(
        castToDoubleArray(children(0)), castToDoubleArray(children(1))) }),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      (children: Seq[Expression]) => { arity(children, 2, "graft_dot"); DotProductExpr(
        castToDoubleArray(children(0)), castToDoubleArray(children(1))) }),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(text, n) - distinct word n-gram shingles"),
      (children: Seq[Expression]) => { arity(children, 2, "graft_word_shingles")
        WordShinglesExpr(children(0), intLit(children(1), "n")) }),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(text, bits) - simhash of whitespace tokens (lowercased internally), md5 bit votes; NULL if no tokens"),
      (children: Seq[Expression]) => { arity(children, 2, "graft_simhash")
        SimHashExpr(children(0), intLit(children(1), "bits")) }),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, k) - k-permutation md5 minhash signature"),
      (children: Seq[Expression]) => { arity(children, 2, "graft_minhash_sig")
        MinHashSigExpr(children(0), intLit(children(1), "k")) }),
    (FunctionIdentifier("graft_md5_min"),
      info("graft_md5_min",
        "graft_md5_min(strings) - min 60-bit md5 over a string array"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_md5_min")
        Md5MinExpr(children(0)) }),
    // Column COMBINATORS below are registered by building their Catalyst
    // expression TREES directly (round-tripping Columns through the
    // bridge yields UnresolvedFunction nodes the analyzer will not
    // resolve inside a registered builder — VERDICT r3 #6). The trees
    // mirror GraftFunctions' Column compositions node for node, so the
    // SQL forms are codegen'd identically to the Scala API.
    (FunctionIdentifier("graft_repetition_stats"),
      info("graft_repetition_stats",
        "graft_repetition_stats(text) - struct(n_tokens, n_distinct, top_token, top_bigram) over whitespace tokens of lower(text)"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_repetition_stats")
        RepetitionStatsExpr(children(0)) }),
    (FunctionIdentifier("graft_gopher_stats"),
      info("graft_gopher_stats",
        "graft_gopher_stats(text) - struct(n_tokens, sum_tok_len, n_alpha_toks, n_symbol_hits, n_lines, n_bullet_lines, n_ellipsis_lines): the Gopher-rule inputs in one pass"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_gopher_stats")
        GopherStatsExpr(children(0)) }),
    (FunctionIdentifier("graft_word_spans"),
      info("graft_word_spans",
        "graft_word_spans(text, k) - ALL k-token spans of lower(text) as strings, duplicates kept (n-gram counting)"),
      (children: Seq[Expression]) => { arity(children, 2, "graft_word_spans")
        WordSpansExpr(children(0), intLit(children(1), "k")) }),
    (FunctionIdentifier("graft_span_hashes"),
      info("graft_span_hashes",
        "graft_span_hashes(text, k) - 60-bit md5 hashes of every k-token span of lower(text), all positions"),
      (children: Seq[Expression]) => { arity(children, 2, "graft_span_hashes")
        SpanHashesExpr(children(0), intLit(children(1), "k")) }),
    (FunctionIdentifier("graft_redact_pii"),
      info("graft_redact_pii",
        "graft_redact_pii(text) - emails, then NANP phones, then IPv4s replaced by <EMAIL>/<PHONE>/<IP> tags"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_redact_pii")
        import graft.functions.GraftFunctions.{emailRe, phoneRe, ipv4Re}
        import org.apache.spark.sql.catalyst.expressions.RegExpReplace
        RegExpReplace(
          RegExpReplace(
            RegExpReplace(children(0), Literal(emailRe), Literal("<EMAIL>")),
            Literal(phoneRe), Literal("<PHONE>")),
          Literal(ipv4Re), Literal("<IP>")) }),
    (FunctionIdentifier("graft_md5_long"),
      info("graft_md5_long",
        "graft_md5_long(str) - deterministic non-negative 60-bit md5 hash (cross-engine: DuckDB CAST('0x'||substr(md5(x),1,15) AS BIGINT))"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_md5_long")
        md5LongExpr(children(0)) }),
    (FunctionIdentifier("graft_dist_lat_lng"),
      info("graft_dist_lat_lng",
        "graft_dist_lat_lng(lat1, lng1, lat2, lng2[, unit]) - great-circle distance, unit 'km' (default) or 'mi'"),
      (children: Seq[Expression]) => {
        require(children.length == 4 || children.length == 5,
          s"graft_dist_lat_lng takes 4 or 5 arguments, got ${children.length}")
        val unit =
          if (children.length == 5) strLit(children(4), "unit") else "km"
        require(unit == "km" || unit == "mi",
          s"graft_dist_lat_lng: unit must be 'km' or 'mi', got '$unit'")
        distLatLngExpr(children(0), children(1), children(2), children(3), unit)
      }),
    (FunctionIdentifier("graft_exact_sum"),
      info("graft_exact_sum",
        "graft_exact_sum(x) - order-independent exact double sum via DECIMAL(18,2) (DuckDB CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE))"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_exact_sum"); Cast(
        new Sum(Cast(children(0), DecimalType(18, 2))).toAggregateExpression(),
        DoubleType) }),
    (FunctionIdentifier("graft_exact_avg"),
      info("graft_exact_avg",
        "graft_exact_avg(x) - exact decimal sum divided by count, in double space"),
      (children: Seq[Expression]) => { arity(children, 1, "graft_exact_avg")
        org.apache.spark.sql.catalyst.expressions.Divide(
          Cast(new Sum(Cast(children(0), DecimalType(18, 2))).toAggregateExpression(),
            DoubleType),
          Cast(Count(children(0)).toAggregateExpression(), DoubleType)) }))

  /** conv(substr(md5(x),1,15),16,10)::long — [[graft.functions
    * .GraftFunctions.md5Long]] as a raw expression tree. */
  private def md5LongExpr(e: Expression): Expression =
    Cast(new Conv(Substring(Md5(Cast(e, BinaryType)),
      Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)

  /** Haversine (spherical-law-of-cosines form) with the acos argument
    * clamped into [-1,1] — [[graft.functions.GraftFunctions.distLatLng]]
    * as a raw tree. */
  private def distLatLngExpr(lat1: Expression, lng1: Expression,
                             lat2: Expression, lng2: Expression,
                             unit: String): Expression = {
    val r = Literal(if (unit == "km") 6371.0 else 3959.0)
    def rad(e: Expression) = ToRadians(Cast(e, DoubleType))
    val cosArg = new Add(
      new Multiply(new Multiply(Cos(rad(lat1)), Cos(rad(lat2))),
        Cos(new Subtract(rad(lng2), rad(lng1)))),
      new Multiply(Sin(rad(lat1)), Sin(rad(lat2))))
    new Multiply(r,
      Acos(Least(Seq(Literal(1.0), Greatest(Seq(Literal(-1.0), cosArg))))))
  }

  private def strLit(e: Expression, arg: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$arg must be a string literal, got $other")
  }

  /** Register on an already-running session (the extensions conf is
    * static; see Bridge.registerFunction). Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, i, b) =>
      Bridge.registerFunction(spark, ident.funcName, i, b)
    }
}
