package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused integer vector kernels for the ANN/k-means paths.
  *
  * The composition they replace — `aggregate(zip_with(a, b, f), 0, +)` —
  * materializes a DIM-length intermediate array and walks two
  * higher-order lambdas PER ROW PAIR; in a brute-force or IVF candidate
  * join that's the innermost loop of queries×candidates evaluations.
  * These expressions run the same Long arithmetic as one allocation-free
  * loop over the unsafe array data, callable from whole-stage codegen
  * like every other native scalar — including ANSI overflow semantics
  * (`multiplyExact`/`addExact` throw exactly where the composition's
  * ANSI-mode `*`/`+` would, so a value that overflows cannot silently
  * diverge from the DuckDB oracle's exact 128-bit view).
  *
  * Both require equal-length non-null-element arrays — the canonical
  * (vid, v, n2) vector frames guarantee it; unequal lengths fail loudly
  * instead of zip_with's silent null. */
object GraftVec {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"graft_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    s
  }

  def l2(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"graft_l2: length mismatch $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    s
  }
}

sealed abstract class GraftVecExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got $l, $r")
    }
  override def dataType: DataType = LongType
  protected def kernel: String // static method name on GraftVec

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftVec.$kernel($a, $b);")
}

/** Σ a(i)·b(i) over two array<bigint> columns. */
case class GraftDot(left: Expression, right: Expression) extends GraftVecExpr {
  override def prettyName: String = "graft_dot"
  override protected def kernel: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): GraftDot = copy(left = l, right = r)
}

object GraftDot {
  def apply(a: Column, b: Column): Column =
    Bridge.column(GraftDot(Bridge.expression(a), Bridge.expression(b)))
}

/** Σ (a(i)−b(i))² over two array<bigint> columns. */
case class GraftL2(left: Expression, right: Expression) extends GraftVecExpr {
  override def prettyName: String = "graft_l2"
  override protected def kernel: String = "l2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.l2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): GraftL2 = copy(left = l, right = r)
}

object GraftL2 {
  def apply(a: Column, b: Column): Column =
    Bridge.column(GraftL2(Bridge.expression(a), Bridge.expression(b)))
}
