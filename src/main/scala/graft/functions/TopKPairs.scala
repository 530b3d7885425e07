package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** `topk_pairs(score, id, k)` (r19): bounded per-group top-k as ONE
  * map-side-combinable aggregate — the serving tier's rerank primitive.
  *
  * Why it exists: every top-k tail in the similarity family ranked with
  * `row_number() OVER (PARTITION BY query ORDER BY sim DESC, id)`, which
  * shuffles and SORTS every candidate row — at serving scale the probed
  * lists' full candidate set (AnnServeSoak's hot-centroid block measured
  * the rerank window as the salted serve's widest task: ~11 s over
  * 17.5M candidate rows). This aggregate keeps AT MOST `k` (score, id)
  * pairs per group in each map partition, so the exchange carries
  * ≤ k × partitions rows per group and no sort ever sees the full
  * candidate set; the k-bounded state merges associatively.
  *
  * Pick order replays the window's exactly: (score desc, id asc), with
  * Spark SQL's double ordering (`x == y` first — -0.0 ties 0.0 — then
  * `Double.compare`, NaN greatest). Rows with a NULL score or id are
  * ignored (the window's `desc` put NULL scores last — beyond any
  * real top-k — and the family never produces them). Output is the
  * sorted `array<struct<sim double, item_id bigint>>`; `posexplode`
  * recovers (rank-1, pair).
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPairs.Buffer] {

  require(k > 0 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("item_id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairs.Buffer =
    new TopKPairs.Buffer(k)

  override def update(buffer: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKPairs.Buffer, other: TopKPairs.Buffer): TopKPairs.Buffer = {
    var j = 0
    while (j < other.size) { buffer.insert(other.scores(j), other.ids(j)); j += 1 }
    buffer
  }

  override def eval(buffer: TopKPairs.Buffer): Any = {
    val out = new Array[Any](buffer.size)
    var j = 0
    while (j < buffer.size) {
      out(j) = new GenericInternalRow(Array[Any](buffer.scores(j), buffer.ids(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKPairs.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var j = 0
    while (j < buffer.size) {
      bb.putDouble(buffer.scores(j)); bb.putLong(buffer.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKPairs.Buffer(k)
    var j = 0
    while (j < n) { b.insert(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {
  /** Spark SQL's double ordering (see [[NearestCentroid]]). */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** (score desc, id asc): negative when (s1, i1) ranks BEFORE (s2, i2). */
  private def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val c = cmpDouble(s2, s1)
    if (c != 0) c else java.lang.Long.compare(i1, i2)
  }

  /** A k-bounded pair list kept SORTED by (score desc, id asc) —
    * insertion is O(k) array shift on the (rare past warm-up) accepted
    * rows and O(1) rejection against the current worst; k is the
    * operator's literal (5–100), so no heap is warranted.
    */
  final class Buffer(val k: Int) {
    var size: Int = 0
    val scores: Array[Double] = new Array[Double](k)
    val ids: Array[Long] = new Array[Long](k)

    def insert(s: Double, i: Long): Unit = {
      if (size == k && cmp(s, i, scores(size - 1), ids(size - 1)) >= 0) return
      // binary search for the insertion point in rank order
      var lo = 0
      var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp(s, i, scores(mid), ids(mid)) < 0) hi = mid else lo = mid + 1
      }
      val insertAt = lo
      val newSize = math.min(size + 1, k)
      var j = newSize - 1
      while (j > insertAt) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      if (insertAt < k) { scores(insertAt) = s; ids(insertAt) = i; size = newSize }
    }
  }
}
