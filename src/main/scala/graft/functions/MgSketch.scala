package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `mg_candidates(key, k)` — a Misra–Gries heavy-hitter summary as a
  * native `TypedImperativeAggregate`: at most `k` counters per buffer,
  * with the classic guarantee that any key whose true frequency exceeds
  * n/(k+1) of the n rows seen is STILL PRESENT when the pass ends (its
  * counter can be depressed, never evicted to zero while f > n/(k+1)).
  * `update` is the textbook algorithm (hit → increment; room → insert;
  * full → decrement every counter, dropping zeros — each such event
  * destroys k+1 units of count mass, which bounds total error by
  * n/(k+1)); `merge` is the mergeable-summaries form (Agarwal et al.,
  * PODS'12): sum counters, then subtract the (k+1)-th largest count from
  * all and truncate — the error bound stays n_total/(k+1) after any
  * merge tree, so map-side partials of ≤ k counters combine freely
  * before the exchange. A 1000-executor pass ships k counters per
  * partition instead of one row per distinct key — the whole point.
  *
  * Eval returns the surviving keys sorted ascending (`array<string>`).
  * The SET is merge-order-dependent below the guarantee line (a sketch,
  * not an answer): consumers must treat it as a CANDIDATE superset and
  * verify exactly — q142 does, and only the verified rows leave the
  * query. Null keys are ignored.
  */
case class MgCandidates(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "mg_candidates: k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_candidates expects (string, int literal), got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long](k * 2)

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val key = child.eval(input)
    if (key != null) {
      val s = key.toString
      val cur = buf.get(s)
      if (cur != null) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else {
        // full + miss: decrement-all, drop zeros (k+1 count units die)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, java.lang.Long],
      b: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everyone and truncate:
      // at most k counters exceed it, and the subtraction debits every
      // surviving estimate equally, preserving the n/(k+1) error bound
      val counts = new Array[Long](a.size)
      var i = 0
      val vit = a.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val eit = a.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    import scala.jdk.CollectionConverters._
    new GenericArrayData(
      buf.keySet().asScala.toArray.sorted.map(UTF8String.fromString(_)))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MgCandidates =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgCandidates =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MgCandidates =
    copy(child = newChild)
}
