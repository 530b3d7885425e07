package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The per-query-batch ADC distance table as ONE flat value object
  * (r20): for query i = `java.util.Arrays.binarySearch(qids, q)`, the
  * micro-unit LONG distance of subspace `sub` code `c` sits at
  * `flat(i*m*ksub + sub*ksub + c)` — exactly the `qdl` integers the
  * broadcast-join form carried as `(query_id, sub, code, qdl)` rows.
  * Bounded by the serving regime: the table is `|query batch| × m × ksub`
  * longs, the same frame the join form broadcast per stage.
  */
final case class AdcModel(qids: Array[Long], flat: Array[Long],
    m: Int, ksub: Int) extends Serializable

/** Broadcast handle for [[AdcModel]] — same lifecycle as
  * [[CentroidHandle]]: the plan ships the handle, executors cache the
  * table once per broadcast.
  */
final case class AdcHandle(bc: Broadcast[AdcModel], nQueries: Int)
  extends Serializable

/** `adc_dist(query_id, codes)` (r20): the PQ asymmetric-distance sum as
  * ONE projection per candidate row — `Σ_sub table[query][sub][codes[sub]]`
  * over the broadcast per-query distance table.
  *
  * Why it exists: the join formulation expands every candidate into `m`
  * `(item, sub, code)` rows, hash-joins them against the broadcast
  * distance table, and shuffles the whole expansion on `(query_id,
  * item_id)` to sum — the r20 hot-centroid soak measured that stage, not
  * the salted candidate join, as the IVF-PQ serve's dominant cost (the
  * emit rows are id-pairs; the 8× expansion and the pair-keyed exchange
  * are where the time goes). This expression computes the same
  * micro-unit LONG sum in the candidate projection itself: no expansion,
  * no second broadcast join, no `(query, item)` exchange — the pool
  * aggregation (`topk_pairs`) consumes the projection directly.
  *
  * Bit-identical to the join + `sum(qdl)` form by construction: the same
  * per-(query, sub, code) LONG table entries (exact integers, so the sum
  * is order-independent), summed over exactly the `m` subspaces the
  * inner join matched (the table carries EVERY (sub, code) cell for every
  * query in the batch, so the join matched all `m` rows whenever the
  * query existed — and a query absent from the table nulls the sum here,
  * exactly as the inner join emitted no rows for it). A null or
  * wrong-length codes array, or a code outside [0, ksub), nulls the sum
  * (the join form could not produce such rows; the k-bounded tail drops
  * nulls, so degenerate inputs rank nowhere on both forms).
  */
case class AdcDist(left: Expression, right: Expression, handle: AdcHandle)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, ArrayType(LongType))
  override def dataType: DataType = LongType
  // can null out on NON-null inputs (query absent from the table, malformed
  // codes) — without this override BinaryExpression derives nullable from
  // the children and codegen emits an assignment to a constant-false
  // isNull slot, which Janino rejects
  override def nullable: Boolean = true
  override def prettyName: String = "adc_dist"

  @transient private lazy val model: AdcModel = handle.bc.value

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    AdcDist.adcSum(model, q.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val h = ctx.addReferenceObj("adcHandle", handle,
        classOf[AdcHandle].getName)
      val m = ctx.addMutableState(classOf[AdcModel].getName, "adcModel",
        v => s"$v = (${classOf[AdcModel].getName}) $h.bc().value();")
      // the helper is named adcSum, NOT eval: a companion method whose
      // name matches an inherited instance method gets NO static
      // forwarder on the class, and Janino then resolves the generated
      // call against Expression.eval(InternalRow) and fails — silent
      // interpreted fallback (caught live in r20; the r19 lesson class)
      val r = ctx.freshName("adcR")
      s"""Object $r = graft.functions.AdcDist.adcSum($m, $q, $c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

object AdcDist {
  /** Boxed-Long sum (null on any degenerate input) — Java-callable from
    * generated code.
    */
  def adcSum(mo: AdcModel, q: Long, codes: ArrayData): java.lang.Long = {
    val qi = java.util.Arrays.binarySearch(mo.qids, q)
    if (qi < 0) return null
    if (codes.numElements() != mo.m) return null
    val base = qi * mo.m * mo.ksub
    var dl = 0L
    var sub = 0
    while (sub < mo.m) {
      if (codes.isNullAt(sub)) return null
      val c = codes.getLong(sub)
      if (c < 0 || c >= mo.ksub) return null
      dl += mo.flat(base + sub * mo.ksub + c.toInt)
      sub += 1
    }
    java.lang.Long.valueOf(dl)
  }
}

/** Content-keyed broadcast registry for ADC distance tables — the
  * [[CentroidBroadcasts]] lifecycle for the PQ serving tier: a repeated
  * serve over the same query batch + codebook resolves to the SAME
  * broadcast; eviction past the window unpersists only.
  */
object AdcBroadcasts {
  /** At the documented serving regime (query batches in the hundreds to
    * low thousands, m ≤ 16, ksub ≤ 256) a table is single-digit MB; 16
    * entries bound the driver at well under the flat-Bloom budget.
    */
  val MaxEntries = 16

  /** Query-batch budget: the table is nq × m × ksub longs and must stay
    * broadcast-sized — 2^22 longs = 32 MB. A batch past it belongs on the
    * join formulation (which this expression replaced on the serve path),
    * split into sub-batches.
    */
  val MaxCells: Long = 1L << 22

  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[String, AdcHandle]

  def handleFor(spark: SparkSession, model: AdcModel): AdcHandle = synchronized {
    require(model.qids.length.toLong * model.m * model.ksub <= MaxCells,
      s"ADC table ${model.qids.length} queries x ${model.m} x ${model.ksub} " +
        s"exceeds the $MaxCells-cell broadcast budget — split the query batch")
    val key = fingerprint(model)
    entries.get(key) match {
      case Some(h) => h
      case None =>
        val h = AdcHandle(spark.sparkContext.broadcast(model), model.qids.length)
        entries.put(key, h)
        while (entries.size > MaxEntries) {
          val (k, old) = entries.head
          entries.remove(k)
          old.bc.unpersist(blocking = false)
        }
        h
    }
  }

  /** Registry size, for lifecycle specs. */
  def size: Int = synchronized { entries.size }

  /** Drop every entry (unpersist, never destroy). */
  def clear(): Unit = synchronized {
    entries.values.foreach(_.bc.unpersist(blocking = false))
    entries.clear()
  }

  private def fingerprint(mo: AdcModel): String = {
    val md = MessageDigest.getInstance("MD5")
    val bb = ByteBuffer.allocate(8192)
    def flush(): Unit = { bb.flip(); md.update(bb); bb.clear() }
    def putLong(l: Long): Unit = {
      if (bb.remaining() < 8) flush()
      bb.putLong(l)
      ()
    }
    putLong(mo.m.toLong)
    putLong(mo.ksub.toLong)
    putLong(mo.qids.length.toLong)
    mo.qids.foreach(putLong)
    mo.flat.foreach(putLong)
    flush()
    md.digest().map("%02x".format(_)).mkString
  }
}
