package graft.functions

import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A Bloom state resolved for SERVING: the `(word, bits)` table collected
  * into a dense long array (index = word, `bits.value.length` = the
  * build's word count) riding a Spark `Broadcast` — the handle serializes
  * small and executors fetch the array through the broadcast machinery,
  * so the same expression is cluster-correct.
  *
  * `nShards` (r19, VERDICT #6): a SHARD-ROUTED state
  * ([[graft.ops.SketchOps.bloomBitsRouted]]) resolves into ONE
  * shard-major array of `words × nShards` longs (slice s = indices
  * `[s*words, (s+1)*words)`); the probe computes its shard from the
  * build's own routing hash and touches ONLY its slice. One broadcast
  * per routed filter — the array is `nShards ×` the flat budget ONCE
  * per executor, not re-shipped per probe batch like the join form's
  * state broadcast.
  */
final case class BloomHandle(bits: Broadcast[Array[Long]], k: Int,
    nShards: Int = 1) extends Serializable

/** `bloom_might_contain(value, 'handle-key')` (r18): the SERVING-path
  * probe of a Bloom `(word, bits)` state as a native codegen projection —
  * true iff all `k` bits of `value` are set. Bit-identical to the
  * join-based [[graft.ops.SketchOps.bloomProbe]] over the same state
  * (same md5-prefix `hash32(j ':' value) % m` hashes, same 32-used-bits
  * word layout), certified by spec.
  *
  * Why it exists beside the join probe: the join probe is the
  * ORACLE-REPLAYABLE form (the DuckDB twin rebuilds the bit matrix and
  * joins the same way) and stays on the gated `corpus_batch_admit_bloom*`
  * entries; but as a per-batch evaluator it pays an explode (k rows per
  * probe), a broadcast-exchange REBUILD per query, and a groupBy shuffle
  * back to one verdict per row. This expression is one whole-stage-codegen
  * projection per row — no shuffle, no exchange, and the broadcast VALUE
  * is a Spark `Broadcast` that persists across queries/micro-batches, so
  * a long-lived admitter pays the state fan-out once. At the sizer's
  * 2^24-word cap the array is 134 MB — exactly the documented broadcast
  * budget of the flat filter.
  *
  * Constructed through the registered SQL function: the builder resolves
  * `'handle-key'` against the driver-side [[BloomMightContain.register]]
  * registry at PLAN BUILD time and captures the resolved [[BloomHandle]]
  * in the expression — executors see only the broadcast handle, never the
  * registry.
  */
case class BloomMightContain(child: Expression, handle: BloomHandle)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomMightContain.contains(
      handle.bits.value, handle.k, handle.nShards, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val h = ctx.addReferenceObj("bloomHandle", handle,
        classOf[BloomHandle].getName)
      s"""${ev.value} = graft.functions.BloomMightContain.contains(
         |  (long[]) $h.bits().value(), $h.k(), $h.nShards(), $c);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  private final case class Entry(current: BloomHandle, retiring: Option[BloomHandle])

  /** Driver-side handle registry: consulted only by the SQL-function
    * builder at plan-build time; entries are tiny (a broadcast handle +
    * k). Keys are caller-chosen; re-registering a key replaces it.
    */
  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, Entry]

  /** Re-registering a key REPLACES the entry with a ONE-GENERATION
    * retirement lag (r19, hardened from r18's destroy-on-replace): the
    * superseded broadcast is `unpersist`ed — executors drop their copies
    * but a straddling task retry from the previous micro-batch can still
    * REFETCH it from the driver (r18 destroyed it outright, which such a
    * retry would have hit as a SparkException) — and only the generation
    * before THAT (two registrations old, no live plan can hold it: its
    * replacing plan has itself been replaced) is destroyed. A long-lived
    * admitter under a stable key therefore holds at most two arrays:
    * current (persisted) + retiring (driver-side only).
    */
  def register(key: String, handle: BloomHandle): Unit = synchronized {
    require(handle.k > 0 && handle.k <= 9,
      s"k must be in [1, 9] (single-digit hash prefixes), got ${handle.k}")
    // r20 (ADVICE): contains() slices the array as nShards × (len/nShards)
    // words — a handle whose array the shard count does not divide would
    // silently probe wrong slices (false NEGATIVES, the one error class a
    // Bloom filter must never produce). Fail at registration, where the
    // driver still holds the array.
    require(handle.nShards >= 1, s"nShards must be >= 1, got ${handle.nShards}")
    require(handle.bits.value.length > 0 &&
        handle.bits.value.length % handle.nShards == 0,
      s"bits length ${handle.bits.value.length} is not a positive multiple of " +
        s"nShards ${handle.nShards} — mis-sized handles probe wrong slices")
    val old = registry.get(key)
    old.flatMap(_.retiring).foreach(_.bits.destroy())
    old.foreach(_.current.bits.unpersist(blocking = false))
    registry.put(key, Entry(handle, old.map(_.current)))
    ()
  }

  /** Drop a key's entry (r19, ADVICE: auto-generated keys previously
    * stayed registered forever, pinning each broadcast against
    * ContextCleaner for the JVM's life). The current generation is
    * unpersisted but NOT destroyed — a plan that captured the handle at
    * build time and has not evaluated yet refetches from the driver, and
    * ContextCleaner reclaims the array once the last plan reference is
    * gone; the retiring generation (two registrations old) destroys.
    * Call after the resolving query's output has materialized.
    */
  def release(key: String): Unit = synchronized {
    registry.remove(key).foreach { e =>
      e.retiring.foreach(_.bits.destroy())
      e.current.bits.unpersist(blocking = false)
    }
  }

  def handle(key: String): BloomHandle =
    registry.get(key).map(_.current).getOrElse(throw new IllegalArgumentException(
      s"no Bloom handle registered under '$key' — call BloomMightContain.register first"))

  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** All-k-bits-set test, bit-identical to the join probe's
    * `hash32(concat(j ':', value)) % (words*32)` hashes: first 4 md5
    * digest bytes big-endian unsigned == `conv(substring(md5, 1, 8), 16,
    * 10)`. For a SHARDED state (`nShards > 1`) the probe first routes by
    * the build's own shard hash — `hash32(value) % nShards`, no prefix —
    * and tests only that shard's slice, replaying
    * [[graft.ops.SketchOps.bloomProbeRouted]]'s `(shard, word)` join
    * bit for bit. Java-callable from generated code.
    */
  def contains(bits: Array[Long], k: Int, nShards: Int, value: UTF8String): Boolean = {
    val vb = value.getBytes
    val md = mdPool.get()
    val words = bits.length / nShards
    val offset =
      if (nShards == 1) 0
      else {
        md.reset()
        md.update(vb)
        (h32(md.digest()) % nShards).toInt * words
      }
    val m = words.toLong * 32L
    var j = 0
    while (j < k) {
      md.reset()
      md.update(('0' + j).toByte)
      md.update(':'.toByte)
      md.update(vb)
      val bit = h32(md.digest()) % m
      if ((bits(offset + (bit >> 5).toInt) & (1L << (bit & 31L).toInt)) == 0L)
        return false
      j += 1
    }
    true
  }

  /** First 4 digest bytes, big-endian unsigned — the engine's `hash32`. */
  private def h32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
}
