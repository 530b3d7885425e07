package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** A centroid model resolved for SERVING (r20, VERDICT #1): the matrix
  * rides a Spark `Broadcast` instead of the expression's own reference
  * object, so the serialized plan ships a tiny handle and executors fetch
  * the arrays through the broadcast machinery ONCE — not ~2 MB (4096 × 64
  * doubles) re-shipped with every stage launch and every
  * `stream_ann_serve` micro-batch re-plan, which is what
  * `ctx.addReferenceObj(model)` cost at production stage counts.
  * `n` mirrors the centroid count driver-side so expression preconditions
  * (e.g. the silhouette's ≥ 2) check without touching the value.
  */
final case class CentroidHandle(bc: Broadcast[CentroidModel], n: Int)
  extends Serializable

/** The exact-kernel twin of [[CentroidHandle]] for the SemDeDup family. */
final case class QCentroidHandle(bc: Broadcast[QCentroidModel], n: Int)
  extends Serializable

/** Driver-side broadcast registry for bounded centroid models — the
  * [[BloomMightContain]] lifecycle adapted to CONTENT keys. Bloom handles
  * are keyed by caller NAME (a stream re-registers the same key with a
  * grown filter, so replacement needs the one-generation retirement lag);
  * centroid models are immutable values, so the key is a fingerprint of
  * the content itself: the same collected centroid set — a serve entry
  * re-built per query batch, a foreachBatch assigner re-invoked per
  * micro-batch — resolves to the SAME `Broadcast`, and executors keep one
  * cached copy across all of them. Distinct content never "replaces"
  * anything; the registry instead holds a bounded window (newest
  * [[MaxEntries]]) and EVICTS the oldest beyond it with `unpersist`, never
  * `destroy` — a straddling plan that still holds an evicted handle
  * refetches from the driver, and ContextCleaner reclaims the array once
  * the last plan reference is gone (the same straddling-task argument as
  * BloomMightContain.register's retirement lag, without needing the lag:
  * eviction only ever drops executor caches).
  */
object CentroidBroadcasts {
  /** Bounded registry window: at the 4096 × 64 budget an entry is ~2 MB
    * driver-side, so 32 entries cap the registry at ~64 MB; the engine's
    * registered suite builds a handful of distinct models per session.
    */
  val MaxEntries = 32

  private val raw =
    scala.collection.mutable.LinkedHashMap.empty[String, CentroidHandle]
  private val quant =
    scala.collection.mutable.LinkedHashMap.empty[String, QCentroidHandle]

  /** Resolve (or create) the broadcast handle for a raw-double model.
    * Content-keyed: bit-identical centroid sets share one broadcast.
    */
  def handleFor(spark: SparkSession,
      cents: Seq[(Long, Seq[Double])]): CentroidHandle = synchronized {
    val key = "raw:" + fingerprint(cents)
    raw.get(key) match {
      case Some(h) => h
      case None =>
        val h = CentroidHandle(
          spark.sparkContext.broadcast(CentroidModel(cents)), cents.size)
        raw.put(key, h)
        evict(raw)
        h
    }
  }

  /** Resolve (or create) the broadcast handle for the exact-kernel
    * (micro-quantized) model.
    */
  def qhandleFor(spark: SparkSession,
      cents: Seq[(Long, Seq[Double])]): QCentroidHandle = synchronized {
    val key = "q:" + fingerprint(cents)
    quant.get(key) match {
      case Some(h) => h
      case None =>
        val h = QCentroidHandle(
          spark.sparkContext.broadcast(QCentroidModel(cents)), cents.size)
        quant.put(key, h)
        evict(quant)
        h
    }
  }

  private def evict[H](m: scala.collection.mutable.LinkedHashMap[String, H]): Unit =
    while (m.size > MaxEntries) {
      val (k, h) = m.head
      m.remove(k)
      h match {
        case CentroidHandle(bc, _) => bc.unpersist(blocking = false)
        case QCentroidHandle(bc, _) => bc.unpersist(blocking = false)
        case _ => ()
      }
    }

  /** Registry size, for lifecycle specs. */
  def size: Int = synchronized { raw.size + quant.size }

  /** Drop every entry (unpersist, never destroy — straddling plans
    * refetch). Test/lifecycle hook, mirroring BloomMightContain.release.
    */
  def clear(): Unit = synchronized {
    raw.values.foreach(_.bc.unpersist(blocking = false))
    quant.values.foreach(_.bc.unpersist(blocking = false))
    raw.clear()
    quant.clear()
  }

  /** Content fingerprint: md5 over (count, then each id + dim + the raw
    * IEEE bits of every component). Bit-exact — two sets differing in one
    * ulp are (correctly) distinct models.
    */
  private def fingerprint(cents: Seq[(Long, Seq[Double])]): String = {
    val md = MessageDigest.getInstance("MD5")
    val bb = ByteBuffer.allocate(8192)
    def flush(): Unit = { bb.flip(); md.update(bb); bb.clear() }
    def putLong(l: Long): Unit = {
      if (bb.remaining() < 8) flush()
      bb.putLong(l)
      ()
    }
    putLong(cents.size.toLong)
    cents.foreach { case (id, v) =>
      putLong(id)
      putLong(v.size.toLong)
      v.foreach(x => putLong(java.lang.Double.doubleToLongBits(x)))
    }
    flush()
    md.digest().map("%02x".format(_)).mkString
  }
}
