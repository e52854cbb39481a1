package graft

import graft.expressions.{CosineSimilarityExpr, DotProductExpr, Md5MinExpr,
  MinHashSigExpr, SimHashExpr, WordShinglesExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

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
      (children: Seq[Expression]) => CosineSimilarityExpr(
        castToDoubleArray(children(0)), castToDoubleArray(children(1)))),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays"),
      (children: Seq[Expression]) => DotProductExpr(
        castToDoubleArray(children(0)), castToDoubleArray(children(1)))),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles",
        "graft_word_shingles(text, n) - distinct word n-gram shingles"),
      (children: Seq[Expression]) =>
        WordShinglesExpr(children(0), intLit(children(1), "n"))),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(text, bits) - simhash of whitespace tokens (lowercased internally), md5 bit votes; NULL if no tokens"),
      (children: Seq[Expression]) =>
        SimHashExpr(children(0), intLit(children(1), "bits"))),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(shingles, k) - k-permutation md5 minhash signature"),
      (children: Seq[Expression]) =>
        MinHashSigExpr(children(0), intLit(children(1), "k"))),
    (FunctionIdentifier("graft_md5_min"),
      info("graft_md5_min",
        "graft_md5_min(strings) - min 60-bit md5 over a string array"),
      (children: Seq[Expression]) => Md5MinExpr(children(0))))
  // NOTE: Column-combinator functions (distLatLng, md5Long, ...) cannot
  // be SQL-registered by round-tripping Columns through the bridge: the
  // round-trip yields a ColumnNodeExpression carrying UnresolvedFunction
  // nodes the analyzer will not resolve inside a registered builder.
  // Only native Expressions go in the registry; combinators stay a
  // Scala-API surface.

  /** Register on an already-running session (the extensions conf is
    * static; see Bridge.registerFunction). Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, i, b) =>
      Bridge.registerFunction(spark, ident.funcName, i, b)
    }
}
