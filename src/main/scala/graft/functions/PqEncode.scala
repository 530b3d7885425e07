package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The PQ codebook as ONE value object: `cvecs(sub * ksub + code)` is the
  * dsub-length subspace centroid — the same arrays the encode join
  * carried as broadcast `(sub, code, cvec)` rows.
  */
final case class PqModel(m: Int, dsub: Int, ksub: Int,
    cvecs: Array[Array[Double]]) extends Serializable

/** Broadcast handle for [[PqModel]] — the [[CentroidHandle]] lifecycle. */
final case class PqHandle(bc: Broadcast[PqModel], m: Int)
  extends Serializable

/** `pq_encode(vec)` (r20): the PQ encode — each subspace's nearest
  * codebook centroid — as ONE projection per vector emitting the
  * `array<bigint>` of m codes (`posexplode` recovers the (sub, code)
  * rows).
  *
  * Why it exists: the join formulation explodes every vector into m
  * subvector rows, broadcast-joins them against ALL ksub codes per
  * subspace (an m × ksub row expansion per vector), and shuffles the
  * expansion on (id, sub) for the `min(struct(dist, code))` pick — at
  * corpus scale that is a 128×-row (m=8, ksub=16) intermediate plus an
  * exchange, paid at every index build and every inline PQ entry. This
  * expression evaluates the same picks in the scan projection: no
  * expansion, no exchange.
  *
  * Pick-identical to `min(struct(l2sq(sv, cvec), code))` by construction,
  * term for term: the distance is the [[VecL2sq]] fold (strict
  * left-to-right `(x-y)^2` accumulation from 0.0; a null element or a
  * length-mismatched slice nulls it — `slice` truncates at the vector
  * end, so a short vector mismatches), and the pick replays Spark's
  * struct-min ordering — a NULL distance ranks FIRST (catalyst orderings
  * put null below every non-null), then the distance compares with
  * Spark's double ordering (NaN greatest, -0.0 ties 0.0), ties break to
  * the SMALLER code. One deliberate divergence: a literal NULL input
  * vector yields a NULL code array (this expression's null contract →
  * posexplode emits no rows) where the join form manufactured code-0
  * rows from the null slices; unreachable on well-formed corpora and
  * arguably the join form's artifact, documented rather than replayed.
  */
case class PqEncode(child: Expression, handle: PqHandle)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val model: PqModel = handle.bc.value

  override protected def nullSafeEval(input: Any): Any =
    PqEncode.encode(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.addReferenceObj("pqHandle", handle,
        classOf[PqHandle].getName)
      val m = ctx.addMutableState(classOf[PqModel].getName, "pqModel",
        v => s"$v = (${classOf[PqModel].getName}) $h.bc().value();")
      // helper named encode, not eval (the r20 static-forwarder lesson)
      s"${ev.value} = graft.functions.PqEncode.encode($m, $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Spark SQL's double ordering (see [[NearestCentroid]]). */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** The m nearest-code picks — Java-callable from generated code. */
  def encode(mo: PqModel, v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Any](mo.m)
    var s = 0
    while (s < mo.m) {
      val start = s * mo.dsub
      // slice truncates at the vector end: a short remainder (or any
      // null element) nulls the distance, exactly the vec_l2sq contract
      val sliceShort = n - start < mo.dsub
      var bestCode = 0L
      var bestNull = true
      var bestDist = 0.0
      var first = true
      var c = 0
      while (c < mo.ksub) {
        val cv = mo.cvecs(s * mo.ksub + c)
        var dNull = sliceShort
        var d = 0.0
        if (!dNull) {
          var i = 0
          while (i < mo.dsub && !dNull) {
            if (v.isNullAt(start + i)) dNull = true
            else {
              val diff = v.getDouble(start + i) - cv(i)
              d += diff * diff
            }
            i += 1
          }
        }
        // struct-min order: (dist asc NULLS FIRST, code asc); codes
        // iterate ascending, so ties never replace
        val better =
          if (first) true
          else if (dNull != bestNull) dNull
          else if (!dNull) cmpDouble(d, bestDist) < 0
          else false
        if (better) { bestCode = c.toLong; bestNull = dNull; bestDist = d; first = false }
        c += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Content-keyed broadcast registry for PQ codebook models — the
  * [[CentroidBroadcasts]] lifecycle; codebooks are tiny (m × ksub × dsub
  * doubles), the registry exists for content reuse across the build /
  * inline entries, not memory pressure.
  */
object PqBroadcasts {
  val MaxEntries = 32

  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[String, PqHandle]

  def handleFor(spark: SparkSession, model: PqModel): PqHandle = synchronized {
    require(model.cvecs.length == model.m * model.ksub,
      s"codebook shape ${model.cvecs.length} != m ${model.m} x ksub ${model.ksub}")
    val key = fingerprint(model)
    entries.get(key) match {
      case Some(h) => h
      case None =>
        val h = PqHandle(spark.sparkContext.broadcast(model), model.m)
        entries.put(key, h)
        while (entries.size > MaxEntries) {
          val (k, old) = entries.head
          entries.remove(k)
          old.bc.unpersist(blocking = false)
        }
        h
    }
  }

  def size: Int = synchronized { entries.size }

  def clear(): Unit = synchronized {
    entries.values.foreach(_.bc.unpersist(blocking = false))
    entries.clear()
  }

  private def fingerprint(mo: PqModel): String = {
    val md = MessageDigest.getInstance("MD5")
    val bb = ByteBuffer.allocate(8192)
    def flush(): Unit = { bb.flip(); md.update(bb); bb.clear() }
    def putLong(l: Long): Unit = {
      if (bb.remaining() < 8) flush()
      bb.putLong(l)
      ()
    }
    putLong(mo.m.toLong)
    putLong(mo.dsub.toLong)
    putLong(mo.ksub.toLong)
    mo.cvecs.foreach { cv =>
      putLong(cv.length.toLong)
      cv.foreach(x => putLong(java.lang.Double.doubleToLongBits(x)))
    }
    flush()
    md.digest().map("%02x".format(_)).mkString
  }
}
