package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_hash(text)`: polynomial (Horner) rolling hash over the UTF-8
  * bytes — `h = fold(h * 31 + byte) mod 1e9+7` — the document-fingerprint
  * primitive (SURVEY.md §7.11 "rolling hash").
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode`, not a
  * UDF: the generated loop lives INSIDE whole-stage codegen, so fingerprint
  * scans stay in one fused stage with no Row boxing or lambda dispatch per
  * row. The interpreted `nullSafeEval` path is kept semantically identical
  * (spec asserts codegen == interpreted == reference).
  *
  * The constants (base 31, modulus 1e9+7) are fixed so external engines
  * reproduce the value exactly — the DuckDB oracle replays it with a
  * `list_reduce` Horner fold.
  */
case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql] in Spark 4; the inferred Seq[StringType]
  // conforms to the inherited Seq[AbstractDataType] signature
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
