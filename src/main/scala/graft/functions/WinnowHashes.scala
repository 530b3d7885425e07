package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `winnow_hashes(shingles, w)`: the winnowing fingerprint selection of the
  * MOSS local document-fingerprinting algorithm (Schleimer, Wilkerson &
  * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003): hash every shingle with the engine's Horner rolling hash
  * (base 31, mod 1e9+7 — bit-identical to [[RollingHash]]) and emit the
  * minimum hash of every `w`-long window of consecutive shingle hashes.
  * Callers `array_distinct` the result for the fingerprint set — winnowing
  * guarantees at least one selection per window, so any two documents
  * sharing a run of >= w+shingle-1 tokens share a fingerprint.
  *
  * One native codegen'd pass: hashing and window minima fuse into the
  * surrounding WholeStageCodegen stage (a `transform(...)` lambda
  * formulation would run interpreted per shingle — the round-4/5 lesson).
  * Fewer than `w` shingles -> empty array (no window), matching the
  * DuckDB oracle's `range(0, n - w + 1)` replay.
  *
  * A null ELEMENT in the shingle array raises a clear error in both eval
  * paths: the function is SQL-registered, so users can feed it arbitrary
  * arrays, and the generated code would otherwise read undefined bytes
  * from UnsafeArrayData — silently wrong fingerprints, not a crash.
  */
case class WinnowHashes(child: Expression, width: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(width >= 1, s"winnow window must be >= 1, got $width")

  // AbstractDataType is private[sql] in Spark 4; the inferred type of this
  // Seq conforms to the inherited Seq[AbstractDataType] signature
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < width) new GenericArrayData(Array.empty[Any])
    else {
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"winnow_hashes: null shingle at index $i — input array must be non-null")
        val bytes = arr.getUTF8String(i).getBytes
        var acc = 0L
        var b = 0
        while (b < bytes.length) {
          acc = (acc * 31L + (bytes(b) & 0xff)) % 1000000007L
          b += 1
        }
        hs(i) = acc
        i += 1
      }
      val out = new Array[Any](n - width + 1)
      var j = 0
      while (j <= n - width) {
        var m = hs(j)
        var k = j + 1
        while (k < j + width) { if (hs(k) < m) m = hs(k); k += 1 }
        out(j) = m
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val hs = ctx.freshName("hs")
      val out = ctx.freshName("out")
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      s"""
         |int $n = $c.numElements();
         |long[] $out;
         |if ($n < $width) {
         |  $out = new long[0];
         |} else {
         |  long[] $hs = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($c.isNullAt($i)) {
         |      throw new IllegalArgumentException(
         |        "winnow_hashes: null shingle at index " + $i + " — input array must be non-null");
         |    }
         |    byte[] $bytes = $c.getUTF8String($i).getBytes();
         |    long $acc = 0L;
         |    for (int $b = 0; $b < $bytes.length; $b++) {
         |      $acc = ($acc * 31L + ($bytes[$b] & 0xff)) % 1000000007L;
         |    }
         |    $hs[$i] = $acc;
         |  }
         |  $out = new long[$n - $width + 1];
         |  for (int $j = 0; $j <= $n - $width; $j++) {
         |    long $m = $hs[$j];
         |    for (int $k = $j + 1; $k < $j + $width; $k++) {
         |      if ($hs[$k] < $m) $m = $hs[$k];
         |    }
         |    $out[$j] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}
