package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(tokens, w)`: overlapping w-token windows of a token
  * array, each joined by a single space — the MinHash input unit
  * (SURVEY.md §7.11; shingling per the classic MinHash construction).
  *
  * A native Catalyst `Expression` with `doGenCode` replacing the previous
  * `transform(sequence(...), i -> array_join(slice(...)))` formulation:
  * higher-order functions evaluate their lambda INTERPRETED per element,
  * and shingling sits in the hot path of every MinHash consumer
  * (near-dup banding, Jaccard verification, decontamination, top-k
  * n-grams). The generated loop lives inside whole-stage codegen — one
  * pass over the token array per row, no lambda dispatch.
  *
  * Semantics (bit-identical to the old formulation and the DuckDB oracle's
  * `tk[i:i+w-1]` replay): fewer than `w` tokens -> empty array; otherwise
  * `n - w + 1` shingles.
  */
case class WordShingles(child: Expression, width: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(width >= 1, s"shingle width must be >= 1, got $width")

  // AbstractDataType is private[sql] in Spark 4; the inferred type of this
  // Seq conforms to the inherited Seq[AbstractDataType] signature
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < width) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - width + 1)
      val parts = new Array[UTF8String](width)
      var i = 0
      while (i <= n - width) {
        var j = 0
        while (j < width) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val u8s = "org.apache.spark.unsafe.types.UTF8String"
      val sepRef = ctx.addReferenceObj("shingleSep", sep, u8s)
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $c.numElements();
         |$u8s[] $out;
         |if ($n < $width) {
         |  $out = new $u8s[0];
         |} else {
         |  $out = new $u8s[$n - $width + 1];
         |  $u8s[] $parts = new $u8s[$width];
         |  for (int $i = 0; $i <= $n - $width; $i++) {
         |    for (int $j = 0; $j < $width; $j++) {
         |      $parts[$j] = $c.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $u8s.concatWs($sepRef, $parts);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
