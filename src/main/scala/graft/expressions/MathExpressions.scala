package graft.expressions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Exact integer arithmetic expressions for float-free gates.
  *
  * Rationale (VERDICT r13): a gated query whose only non-integer step is
  * one IEEE `sqrt` is *provably* exact-rounded — and still went
  * driver-red (t31). The robust contract is zero floating-point
  * operations anywhere in the gate: every quantity either an integer or
  * a DECIMAL with scale 0, every comparison and division exact. The
  * DuckDB oracle twin replays isqrt with a recursive-CTE integer Newton
  * iteration in HUGEINT (DataQueries.t31Sql) — two independent
  * pure-integer computations that must agree on every input, not just
  * non-boundary ones.
  */
object MathExpressions {

  /** Floor integer square root of a non-negative DECIMAL(38,0) column,
    * as DECIMAL(38,0). Errors on negative input (loud, both engines'
    * behavior for a contract violation — never a silent null). */
  def isqrtDec(c: Column): Column =
    Bridge.column(IsqrtExpr(Bridge.expression(c)))
}

/** floor(sqrt(x)) of a non-negative decimal with scale 0, computed in
  * pure integer arithmetic (`java.math.BigInteger.sqrt`, Java 9+ — a
  * deterministic integer Newton iteration, no libm anywhere).
  *
  * Used on BOUNDED relations only (per-language plan rows, |langs|
  * rows) — CodegenFallback's one virtual call per row is irrelevant
  * there; do not put this on a corpus-sized hot path without measuring.
  *
  * Oracle twin: WITH RECURSIVE Newton `x' = (x + m // x) // 2` in
  * HUGEINT seeded at `m // 2 + 1`, answer `MIN(x)` over iterates — all
  * iterates of the integer Newton map stay >= isqrt(m) and the
  * sequence strictly decreases until it reaches isqrt(m) (then
  * oscillates isqrt <-> isqrt+1), so the min over enough iterations IS
  * the floor square root, exactly.
  */
case class IsqrtExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_isqrt"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case d: DecimalType if d.scale == 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_isqrt requires a scale-0 DECIMAL child, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v: BigInteger = input.asInstanceOf[org.apache.spark.sql.types.Decimal]
      .toJavaBigDecimal.toBigIntegerExact
    if (v.signum() < 0)
      throw new ArithmeticException(s"graft_isqrt of negative value $v")
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(v.sqrt()))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
