package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded bottom-k aggregate: keeps the `k` values with the SMALLEST sort
  * keys per group, in one pass with O(k) state — the
  * `TypedImperativeAggregate` leg of graft's custom-Catalyst surface
  * (SURVEY.md §2.10; the codegen scalar leg is [[DotProductExpr]]).
  *
  * Why an imperative aggregate instead of a window: `row_number() OVER
  * (PARTITION BY g ORDER BY key) <= k` shuffles and sorts EVERY row of
  * every group; this aggregate folds map-side to k rows per group before
  * the exchange, so the shuffle carries k·groups rows regardless of group
  * size — the difference between feasible and not on a trillion-row group.
  *
  * With `key = md5(value)` the result is a uniform deterministic k-sample
  * per group (hash order is uncorrelated with any data order) — the
  * classic scalable group-sample. State is a max-heap of (key, value)
  * capped at k; merge folds heaps pairwise, so partial aggregation
  * composes exactly. Spill serialization length-prefixes each key's UTF-8
  * bytes, so keys of ANY length round-trip (digest keys are still the
  * sensible choice — the heap holds k full keys in memory per group).
  * Input types are declared ([[ExpectsInputTypes]]): a non-string key or
  * non-long value fails at ANALYSIS time, not as an executor-side
  * ClassCastException.
  */
case class BottomKAgg(
    key: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]]
    with ExpectsInputTypes {

  require(k > 0, "graft_bottom_k needs k > 0")

  // covariant narrowing: AbstractDataType is private[sql], DataType is not
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)

  private def heapOrdering: Ordering[(String, Long)] =
    Ordering.by[(String, Long), (String, Long)](identity)(
      Ordering.Tuple2(Ordering.String, Ordering.Long))

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](heapOrdering) // max-heap

  private def offer(
      buf: mutable.PriorityQueue[(String, Long)],
      e: (String, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (heapOrdering.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(
      buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val kEval = key.eval(input)
    val vEval = value.eval(input)
    if (kEval != null && vEval != null) {
      offer(buf, (kEval.asInstanceOf[UTF8String].toString,
        vEval.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(String, Long)],
      b: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toSeq.sorted(heapOrdering).map(_._2).toArray)

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, v) =>
      // length-prefixed UTF-8 (NOT writeUTF, whose 2-byte length field
      // caps a key at 64 KiB and fails only at shuffle time)
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val s = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.enqueue((s, in.readLong()))
    }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, value)
  override def prettyName: String = "graft_bottom_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAgg =
    copy(key = newChildren(0), value = newChildren(1))
}
