package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen vector arithmetic: `vec_dot(a, b)` and `vec_l2sq(a, b)`
  * over `array<double>` columns.
  *
  * These replace the `aggregate(zip_with(...), 0.0, _ + _)` folds that sat
  * in every similarity hot path (centroid assignment, brute-force top-k,
  * SemDeDup pair verification, PQ training/ADC) — higher-order functions
  * evaluate their lambdas INTERPRETED per element (the round-4/5 lesson,
  * third recurrence), which at sf1 made the interpreted fold the dominant
  * cost of the whole `sim_` family. The generated loop lives inside
  * whole-stage codegen: one pass, no lambda dispatch, no boxing.
  *
  * Semantics are bit-identical to the fold they replace: strict
  * left-to-right accumulation from 0.0 (the order the DuckDB oracles
  * replay), NULL when the lengths differ (zip_with padded with null, which
  * nulled the fold) or when any element is null.
  */
abstract class VecFold extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Per-element contribution added to the accumulator. */
  protected def combine(x: Double, y: Double): Double
  /** Java source of the contribution, over element vars `x`/`y`. */
  protected def combineCode(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += combine(xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $acc += ${combineCode(x, y)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** `vec_dot(a, b)`: sum of elementwise products, left-to-right. */
case class VecDot(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_dot"
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `vec_qdot(a, b)`: EXACT integer dot product of micro-quantized
  * components — `sum_i floor(a_i*1e6 + 0.5) * floor(b_i*1e6 + 0.5)` as
  * LONG.
  *
  * This is the cross-engine-exact similarity kernel for the SemDeDup
  * family (the r11 driver fork): each component quantization is a fixed
  * two-op correctly-rounded IEEE sequence on the identical input double,
  * and everything after it is exact 64-bit integer arithmetic — so the
  * result is bit-identical under ANY evaluation order, vectorization,
  * fusion, or engine build, which no double-accumulation fold (however
  * carefully ordered) can guarantee across engines. A cosine derived as
  * `qdot(a,b) / (sqrt(qdot(a,a)) * sqrt(qdot(b,b)))` is then a fixed
  * 4-op correctly-rounded DAG over exact integers: bit-identical on any
  * IEEE-conforming engine.
  *
  * Overflow bound: |component| < 10 keeps every product below 1e14 and a
  * 4096-dim sum below 2^62; the embedding regime (|x| <= 1, dim <= 1k)
  * is orders of magnitude inside it. Quantized sums stay <= 2^53, so the
  * LONG->DOUBLE cast downstream is exact. The contract is ENFORCED, not
  * assumed: products and the running sum accumulate through
  * `Math.multiplyExact`/`addExact` (JIT intrinsics — an overflow-checked
  * add costs the same branch-predicted cycle as a raw one), so an input
  * outside the documented regime raises ArithmeticException instead of
  * silently wrapping into a wrong-but-plausible similarity.
  */
case class VecQDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_qdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(
        math.floor(xs.getDouble(i) * 1e6 + 0.5).toLong,
        math.floor(ys.getDouble(i) * 1e6 + 0.5).toLong))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = Math.addExact($acc, Math.multiplyExact(
         |      (long) Math.floor($a.getDouble($i) * 1.0E6 + 0.5),
         |      (long) Math.floor($b.getDouble($i) * 1.0E6 + 0.5)));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `vec_l2sq(a, b)`: sum of squared elementwise differences,
  * left-to-right.
  */
case class VecL2sq(left: Expression, right: Expression) extends VecFold {
  override def prettyName: String = "vec_l2sq"
  override protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def combineCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
