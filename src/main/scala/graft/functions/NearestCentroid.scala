package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** The bounded centroid set as ONE value object: ids, vectors,
  * and the precomputed norms `sqrt(vec_dot(c, c))` — the same values
  * Catalyst constant-folded out of the r18 `greatest(...)` projection's
  * literal terms (computed with the identical left-to-right
  * accumulation), now computed once at model build instead of once per
  * plan literal. Rides a [[CentroidHandle]] `Broadcast` into the
  * expressions (r20) — see [[CentroidBroadcasts]].
  */
final case class CentroidModel(ids: Array[Long], vecs: Array[Array[Double]],
    norms: Array[Double]) extends Serializable

object CentroidModel {
  def apply(cents: Seq[(Long, Seq[Double])]): CentroidModel = {
    val ids = cents.map(_._1).toArray
    val vecs = cents.map(_._2.toArray).toArray
    val norms = vecs.map { v =>
      var a = 0.0; var i = 0
      while (i < v.length) { a += v(i) * v(i); i += 1 }
      math.sqrt(a)
    }
    new CentroidModel(ids, vecs, norms)
  }
}

/** `nearest_centroid(vec)` (r19 — VERDICT #5's resolution): the keep=1
  * nearest-centroid argmax as a native codegen expression whose
  * generated code is ONE static call, with the centroid matrix riding as
  * a plan reference object.
  *
  * Why it replaced the r18 inlined `greatest(...)` fold: the fold's
  * generated code grows LINEARLY with the centroid count inside a single
  * whole-stage `processNext()` (expression splitting is unavailable when
  * inputs are pipelined local variables), and at the family's full
  * 1024-centroid bound Janino REFUSES the method outright — silent
  * interpreted fallback, forfeiting exactly the win the fold exists for
  * (SimOpsSpec plans the full bound and proves this stays fixed). This
  * expression keeps the fold's virtues — no crossJoin, no scored-pair
  * materialization, no shuffle, one projection per row — at CONSTANT
  * generated-code size, and shrinks the task binary (one double matrix
  * object instead of 1024 folded literal terms).
  *
  * Bit-identical to both prior forms by construction, term for term:
  * the score is `vec_dot(v, c) / (sqrt(vec_dot(v, v)) * norm_c)` with
  * the same strict left-to-right accumulation as
  * [[graft.functions.VecDot]], `norm_c` precomputed exactly as Catalyst
  * constant-folded `sqrt(vec_dot(lit, lit))`, and the (score desc,
  * centroid_id asc) pick replayed with Spark SQL's own double ordering
  * (`x == y` first — so -0.0 ties 0.0 — then `Double.compare`, NaN
  * greatest); a null element or a length mismatch nulls that term's
  * score (the `vec_dot` contract), ranking it below every non-null one.
  *
  * r20 (VERDICT #1): the matrix rides a [[CentroidHandle]] `Broadcast`
  * instead of a plan reference object — the serialized plan carries the
  * tiny handle, each generated-class instance fetches the arrays ONCE in
  * its init (per task, from the executor's broadcast cache after the
  * first), and `stream_ann_serve` micro-batch re-plans stop re-shipping
  * ~2 MB per batch. Scores and pick are unchanged — the fetched model is
  * the same object the expression used to embed.
  */
case class NearestCentroid(child: Expression, handle: CentroidHandle)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val model: CentroidModel = handle.bc.value

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.pick(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.addReferenceObj("centHandle", handle,
        classOf[CentroidHandle].getName)
      val m = ctx.addMutableState(classOf[CentroidModel].getName, "centModel",
        v => s"$v = (${classOf[CentroidModel].getName}) $h.bc().value();")
      s"${ev.value} = graft.functions.NearestCentroid.pick($m, $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Spark SQL's double ordering (SQLOrderingUtil.compareDoubles): the
    * `==` short-circuit makes -0.0 tie 0.0; `Double.compare` ranks NaN
    * above everything and equal to itself.
    */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Argmax over the model by (score desc, centroid_id asc) — the struct
    * max the greatest() fold computed. Java-callable from generated code.
    */
  def pick(m: CentroidModel, v: ArrayData): Long = {
    val n = v.numElements()
    val xs = new Array[Double](n)
    var vNull = false
    var i = 0
    while (i < n && !vNull) {
      if (v.isNullAt(i)) vNull = true else xs(i) = v.getDouble(i)
      i += 1
    }
    var dvv = 0.0
    i = 0
    while (i < n) { dvv += xs(i) * xs(i); i += 1 }
    val na = math.sqrt(dvv)
    var bestId = 0L
    var bestNull = true
    var bestS = 0.0
    var first = true
    var c = 0
    while (c < m.ids.length) {
      val cv = m.vecs(c)
      val sNull = vNull || cv.length != n
      var s = 0.0
      if (!sNull) {
        var d = 0.0
        var j = 0
        while (j < n) { d += xs(j) * cv(j); j += 1 }
        s = d / (na * m.norms(c))
      }
      val cid = m.ids(c)
      // (sNull, s) desc then centroid_id asc: a null score ranks below
      // every non-null; equal scores break to the SMALLER id
      val better =
        if (first) true
        else if (sNull != bestNull) bestNull
        else if (!sNull) {
          val cs = cmpDouble(s, bestS)
          cs > 0 || (cs == 0 && cid < bestId)
        } else cid < bestId
      if (better) { bestId = cid; bestNull = sNull; bestS = s; first = false }
      c += 1
    }
    bestId
  }
}

/** `nearest_centroids_k(vec)` (r19): the top-`p` nearest centroids as
  * ONE projection per row — the probe-side twin of [[NearestCentroid]].
  * The serving paths assign each query to its `nprobe` centroids; the
  * crossJoin + window form materializes |queries| × |centroids| scored
  * pairs and sorts them per query, which a production query batch turns
  * into the serving path's last all-pairs structure. This emits the
  * ranked `array<bigint>` of centroid ids directly (explode recovers
  * the probe rows), with the identical comparator — raw-cosine
  * (score desc, id asc), Spark's double ordering — and the identical
  * score DAG as the keep=1 expression. A null element or length
  * mismatch nulls every term's score, ranking arbitrary-by-id (the
  * window's null ordering never surfaces: all terms tie).
  */
case class NearestCentroidsK(child: Expression, handle: CentroidHandle, p: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(p > 0 && p <= 1024, s"p (nprobe) must be in [1, 1024], got $p")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids_k"

  @transient private lazy val model: CentroidModel = handle.bc.value

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroidsK.pick(model, p, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.addReferenceObj("centHandle", handle,
        classOf[CentroidHandle].getName)
      val m = ctx.addMutableState(classOf[CentroidModel].getName, "centModel",
        v => s"$v = (${classOf[CentroidModel].getName}) $h.bc().value();")
      s"${ev.value} = graft.functions.NearestCentroidsK.pick($m, $p, $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsK =
    copy(child = newChild)
}

object NearestCentroidsK {
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Top-p centroid ids by (score desc, id asc) — a p-bounded sorted
    * insertion over the model, the [[NearestCentroid.pick]] loop
    * generalized. Java-callable from generated code.
    */
  def pick(m: CentroidModel, p: Int, v: ArrayData): GenericArrayData = {
    val n = v.numElements()
    val xs = new Array[Double](n)
    var vNull = false
    var i = 0
    while (i < n && !vNull) {
      if (v.isNullAt(i)) vNull = true else xs(i) = v.getDouble(i)
      i += 1
    }
    var dvv = 0.0
    i = 0
    while (i < n) { dvv += xs(i) * xs(i); i += 1 }
    val na = math.sqrt(dvv)
    val keep = math.min(p, m.ids.length)
    val topS = new Array[Double](keep)
    val topNull = new Array[Boolean](keep)
    val topId = new Array[Long](keep)
    var size = 0
    // (s1 null-aware desc, id asc): negative when (s1, i1) ranks first
    def cmp(n1: Boolean, s1: Double, i1: Long, n2: Boolean, s2: Double, i2: Long): Int =
      if (n1 != n2) { if (n1) 1 else -1 }
      else {
        val c = if (n1) 0 else cmpDouble(s2, s1)
        if (c != 0) c else java.lang.Long.compare(i1, i2)
      }
    var c = 0
    while (c < m.ids.length) {
      val cv = m.vecs(c)
      val sNull = vNull || cv.length != n
      var s = 0.0
      if (!sNull) {
        var d = 0.0
        var j = 0
        while (j < n) { d += xs(j) * cv(j); j += 1 }
        s = d / (na * m.norms(c))
      }
      val cid = m.ids(c)
      if (size < keep ||
          cmp(sNull, s, cid, topNull(size - 1), topS(size - 1), topId(size - 1)) < 0) {
        var lo = 0
        var hi = size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cmp(sNull, s, cid, topNull(mid), topS(mid), topId(mid)) < 0) hi = mid
          else lo = mid + 1
        }
        val newSize = math.min(size + 1, keep)
        var j = newSize - 1
        while (j > lo) {
          topS(j) = topS(j - 1); topNull(j) = topNull(j - 1); topId(j) = topId(j - 1)
          j -= 1
        }
        if (lo < keep) { topS(lo) = s; topNull(lo) = sNull; topId(lo) = cid; size = newSize }
      }
      c += 1
    }
    val out = new Array[Any](size)
    var j = 0
    while (j < size) { out(j) = topId(j); j += 1 }
    new GenericArrayData(out)
  }
}

/** `nearest_two_qdist(vec)` (r19): the silhouette's two-nearest scan as
  * ONE projection per row — `struct(centroid_id, a, b)` where `a`/`b`
  * are the micro-quantized cosine DISTANCES (`floor((1 - cos)*1e6 +
  * 0.5)` as LONG, the exact `quantMicro(1 - cosine)` chain) to the
  * nearest and second-nearest centroids, ranked (dq asc, id asc). The
  * crossJoin + window form materialized |vectors| × |centroids| pair
  * rows for a report that needs two numbers per vector. Requires ≥ 2
  * centroids at model build (the report's own precondition); a null
  * element / length mismatch nulls a term's distance, ranking it FIRST
  * (the window's asc-nulls-first order — degenerate inputs only).
  */
case class NearestTwoQDist(child: Expression, handle: CentroidHandle)
    extends UnaryExpression with ExpectsInputTypes {

  require(handle.n >= 2,
    "silhouette needs at least 2 centroids (b = distance to the second-nearest)")

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("a", LongType, nullable = true),
    StructField("b", LongType, nullable = true)))
  override def prettyName: String = "nearest_two_qdist"

  @transient private lazy val model: CentroidModel = handle.bc.value

  override protected def nullSafeEval(input: Any): Any =
    NearestTwoQDist.pick(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.addReferenceObj("centHandle", handle,
        classOf[CentroidHandle].getName)
      val m = ctx.addMutableState(classOf[CentroidModel].getName, "centModel",
        v => s"$v = (${classOf[CentroidModel].getName}) $h.bc().value();")
      s"${ev.value} = graft.functions.NearestTwoQDist.pick($m, $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestTwoQDist =
    copy(child = newChild)
}

object NearestTwoQDist {
  /** Two smallest (dq, id) entries by (dq asc NULLS FIRST, id asc) —
    * the silhouette window's order. Java-callable from generated code.
    */
  def pick(m: CentroidModel, v: ArrayData): InternalRow = {
    val n = v.numElements()
    val xs = new Array[Double](n)
    var vNull = false
    var i = 0
    while (i < n && !vNull) {
      if (v.isNullAt(i)) vNull = true else xs(i) = v.getDouble(i)
      i += 1
    }
    var dvv = 0.0
    i = 0
    while (i < n) { dvv += xs(i) * xs(i); i += 1 }
    val na = math.sqrt(dvv)
    // (nullFirst, dq asc, id asc): negative when entry 1 ranks first
    def cmp(n1: Boolean, d1: Long, i1: Long, n2: Boolean, d2: Long, i2: Long): Int =
      if (n1 != n2) { if (n1) -1 else 1 }
      else {
        val c = if (n1) 0 else java.lang.Long.compare(d1, d2)
        if (c != 0) c else java.lang.Long.compare(i1, i2)
      }
    var id1 = 0L; var dq1 = 0L; var null1 = true; var has1 = false
    var id2 = 0L; var dq2 = 0L; var null2 = true; var has2 = false
    var c = 0
    while (c < m.ids.length) {
      val cv = m.vecs(c)
      val sNull = vNull || cv.length != n
      var dq = 0L
      if (!sNull) {
        var d = 0.0
        var j = 0
        while (j < n) { d += xs(j) * cv(j); j += 1 }
        val s = d / (na * m.norms(c))
        // quantMicro(1.0 - cos): floor((1-s)*1e6 + 0.5) to LONG (NaN
        // floors to 0, the engine cast's behavior)
        dq = math.floor((1.0 - s) * 1e6 + 0.5).toLong
      }
      val cid = m.ids(c)
      if (!has1 || cmp(sNull, dq, cid, null1, dq1, id1) < 0) {
        if (has1) { id2 = id1; dq2 = dq1; null2 = null1; has2 = true }
        id1 = cid; dq1 = dq; null1 = sNull; has1 = true
      } else if (!has2 || cmp(sNull, dq, cid, null2, dq2, id2) < 0) {
        id2 = cid; dq2 = dq; null2 = sNull; has2 = true
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](id1,
      if (null1) null else java.lang.Long.valueOf(dq1),
      if (null2) null else java.lang.Long.valueOf(dq2)))
  }
}

/** The micro-quantized centroid set for the exact (SemDeDup-family)
  * assignment: components pre-quantized `floor(x*1e6 + 0.5)` to LONG,
  * norms `sqrt(Σ q²)` folded on the driver in exact integer arithmetic —
  * the identical values [[graft.ops.SimOps.mapSideAssign]]'s literal
  * terms carried.
  */
final case class QCentroidModel(ids: Array[Long], qvecs: Array[Array[Long]],
    qnorms: Array[Double]) extends Serializable

object QCentroidModel {
  def apply(cents: Seq[(Long, Seq[Double])]): QCentroidModel = {
    val ids = cents.map(_._1).toArray
    val qvecs = cents.map(_._2.map(x => math.floor(x * 1e6 + 0.5).toLong).toArray).toArray
    val qnorms = qvecs.map { q =>
      var a = 0L; var i = 0
      while (i < q.length) {
        a = Math.addExact(a, Math.multiplyExact(q(i), q(i))); i += 1
      }
      math.sqrt(a.toDouble)
    }
    new QCentroidModel(ids, qvecs, qnorms)
  }
}

/** `nearest_centroid_q(vec)`: the EXACT-kernel twin of
  * [[NearestCentroid]] for the SemDeDup family — scores through the
  * integer-exact `vec_qdot` kernel (`qdot(v,c) / (sqrt(qdot(v,v)) *
  * qnorm_c)`, overflow-checked LONG accumulation), ranks by the
  * micro-quantized LONG key first (quantize-BEFORE-rank, the family's
  * cross-engine discipline) with the centroid-id tie-break, and returns
  * `struct(centroid_id, cent_sim)`. Replaces the r18 `greatest(...)`
  * literal fold in [[graft.ops.SimOps.mapSideAssign]] for the same
  * reason as its raw-double twin: the fold's generated code grows
  * linearly with the centroid count inside one whole-stage
  * `processNext()` and Janino refuses it at the family's 1024 bound.
  * A null element or length mismatch nulls the term's key and sim (the
  * `vec_qdot` contract), ranking it below every non-null term.
  */
case class QNearestCentroid(child: Expression, handle: QCentroidHandle)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("cent_sim", DoubleType, nullable = true)))
  override def prettyName: String = "nearest_centroid_q"

  @transient private lazy val model: QCentroidModel = handle.bc.value

  override protected def nullSafeEval(input: Any): Any =
    QNearestCentroid.pick(model, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.addReferenceObj("qcentHandle", handle,
        classOf[QCentroidHandle].getName)
      val m = ctx.addMutableState(classOf[QCentroidModel].getName, "qcentModel",
        v => s"$v = (${classOf[QCentroidModel].getName}) $h.bc().value();")
      s"${ev.value} = graft.functions.QNearestCentroid.pick($m, $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): QNearestCentroid =
    copy(child = newChild)
}

object QNearestCentroid {
  /** Argmax by (quantized key desc, centroid_id asc); payload sim rides
    * along. Java-callable from generated code.
    */
  def pick(m: QCentroidModel, v: ArrayData): InternalRow = {
    val n = v.numElements()
    val qv = new Array[Long](n)
    var vNull = false
    var i = 0
    while (i < n && !vNull) {
      if (v.isNullAt(i)) vNull = true
      else qv(i) = math.floor(v.getDouble(i) * 1e6 + 0.5).toLong
      i += 1
    }
    var qvv = 0L
    i = 0
    while (i < n) {
      qvv = Math.addExact(qvv, Math.multiplyExact(qv(i), qv(i))); i += 1
    }
    val nv = math.sqrt(qvv.toDouble)
    var bestId = 0L
    var bestNull = true
    var bestKey = 0L
    var bestSim: Any = null
    var first = true
    var c = 0
    while (c < m.ids.length) {
      val qc = m.qvecs(c)
      val sNull = vNull || qc.length != n
      var key = 0L
      var sim: Any = null
      if (!sNull) {
        var d = 0L
        var j = 0
        while (j < n) {
          d = Math.addExact(d, Math.multiplyExact(qv(j), qc(j))); j += 1
        }
        val s = d.toDouble / (nv * m.qnorms(c))
        // quantMicro: floor(x*1e6 + 0.5) to LONG (NaN floors to 0, the
        // engine cast's behavior)
        key = math.floor(s * 1e6 + 0.5).toLong
        sim = java.lang.Double.valueOf(s)
      }
      val cid = m.ids(c)
      val better =
        if (first) true
        else if (sNull != bestNull) bestNull
        else if (!sNull) key > bestKey || (key == bestKey && cid < bestId)
        else cid < bestId
      if (better) {
        bestId = cid; bestNull = sNull; bestKey = key; bestSim = sim
        first = false
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestId, bestSim))
  }
}
