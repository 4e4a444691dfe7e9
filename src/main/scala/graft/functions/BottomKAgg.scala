package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** `bottomk_sorted(hashKey, value, k)` — the rank sketch (q132/q133) as a
  * native `TypedImperativeAggregate`, the second custom aggregate next to
  * [[HllRegisters]]: proof the extension point generalizes beyond
  * fixed-register sketches to bounded-multiset state. The buffer is a
  * size-capped max-heap of (hash, value) pairs holding the k smallest
  * under the same (hash, value) total order the window formulation sorts
  * by; `update` inserts-and-trims in O(log k), `merge` folds one buffer
  * into the other — associative, commutative and idempotent-on-content
  * because "keep the k least of a union" is order-insensitive, the EXACT
  * merge-identity law AnalyticsSpec proves for the window form. Partial
  * buffers therefore cap at k per group per map partition and combine
  * before the exchange, and the sketch composes with any other aggregate
  * in the same groupBy pass (count rides along without a second
  * aggregate + join, unlike the window formulation).
  *
  * Eval returns the sample's VALUES sorted ascending (`array<double>`) —
  * quantile q is then `element_at(arr, ceil(q·size))`, no window over the
  * sample needed. Null hash or value rows are ignored (the identity hash
  * of a real row is never null). Duplicate (hash, value) pairs are kept —
  * the buffer is a bounded multiset, matching row_number ≤ k semantics.
  */
case class BottomKSorted(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(String, Double)]]
  with BinaryLike[Expression] {

  require(k > 0, "bottomk_sorted: k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_sorted expects (string, double, int literal), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_sorted"

  // max-heap: poll() removes the LARGEST (hash, value) pair, so the queue
  // retains the k least under the same total order the window form uses
  private def newHeap(): java.util.PriorityQueue[(String, Double)] =
    new java.util.PriorityQueue[(String, Double)](k + 1,
      new java.util.Comparator[(String, Double)] {
        override def compare(a: (String, Double), b: (String, Double)): Int = {
          val c = b._1.compareTo(a._1)
          if (c != 0) c else java.lang.Double.compare(b._2, a._2)
        }
      })

  private def insert(heap: java.util.PriorityQueue[(String, Double)],
      hh: String, v: Double): Unit = {
    heap.add((hh, v))
    if (heap.size > k) heap.poll()
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(String, Double)] =
    newHeap()

  override def update(buf: java.util.PriorityQueue[(String, Double)],
      input: InternalRow): java.util.PriorityQueue[(String, Double)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      insert(buf, h.toString, v.asInstanceOf[Double])
    buf
  }

  override def merge(a: java.util.PriorityQueue[(String, Double)],
      b: java.util.PriorityQueue[(String, Double)])
      : java.util.PriorityQueue[(String, Double)] = {
    val it = b.iterator()
    while (it.hasNext) { val (h, v) = it.next(); insert(a, h, v) }
    a
  }

  override def eval(buf: java.util.PriorityQueue[(String, Double)]): Any = {
    import scala.jdk.CollectionConverters._
    new GenericArrayData(buf.asScala.toArray.map(_._2).sorted)
  }

  override def serialize(buf: java.util.PriorityQueue[(String, Double)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (h, v) = it.next()
      out.writeUTF(h)
      out.writeDouble(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[(String, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = newHeap()
    val n = in.readInt()
    var i = 0
    while (i < n) { insert(heap, in.readUTF(), in.readDouble()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSorted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSorted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSorted =
    copy(left = newLeft, right = newRight)
}
