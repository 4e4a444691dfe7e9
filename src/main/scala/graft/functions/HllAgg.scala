package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `hll_registers(key)` — HyperLogLog register bank (m = 64) as a native
  * `TypedImperativeAggregate`: the custom-AGGREGATE extension point, next
  * to the scalar expression families (VecExprs/SetExprs/TextExprs). The
  * buffer is the 64-int register array itself; `update` folds one key in
  * place, `merge` is elementwise max — associative and commutative, so
  * partial banks built per executor collapse map-side before the exchange
  * exactly like any built-in aggregate. This is the operational shape of
  * every production sketch library (DataSketches, Spark's own
  * `hll_sketch_agg`), re-derived on the public API.
  *
  * Hash family is BIT-IDENTICAL to the Column-level formulation q105/q118/
  * q122 build from `md5`/`conv`/`bin`: bucket = first 32 md5 bits mod 64,
  * w = next 32 bits, rank = 33 − bitlength(w) (= nlz(w) − 31 for w > 0,
  * 33 for w = 0). The register bank therefore matches those queries'
  * aggregates register-for-register — which is exactly what q126 checks
  * against q105's DuckDB oracle, and HllAggSpec pins buffer-level.
  *
  * Input: the key as STRING (cast upstream, as the Column formulations
  * do). Nulls are ignored, like count(DISTINCT). Output:
  * `array<int>` of 64 registers.
  */
case class HllRegisters(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  private val m = 64

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects a string key, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  // one digest instance per aggregate object per task — MessageDigest is
  // not thread-safe but each buffer is single-threaded within a task
  @transient private lazy val digest = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = digest.digest(v.toString.getBytes(StandardCharsets.UTF_8))
      // first 4 md5 bytes = the first 8 hex digits the Column form parses
      val bucket = ((java.lang.Byte.toUnsignedLong(bytes(0)) << 24) |
        (java.lang.Byte.toUnsignedLong(bytes(1)) << 16) |
        (java.lang.Byte.toUnsignedLong(bytes(2)) << 8) |
        java.lang.Byte.toUnsignedLong(bytes(3))) % m
      val w = (java.lang.Byte.toUnsignedLong(bytes(4)) << 24) |
        (java.lang.Byte.toUnsignedLong(bytes(5)) << 16) |
        (java.lang.Byte.toUnsignedLong(bytes(6)) << 8) |
        java.lang.Byte.toUnsignedLong(bytes(7))
      // 33 - bitlength(w): bin(w) has 64 - nlz(w) digits for w > 0
      val rho =
        if (w == 0L) 33 else java.lang.Long.numberOfLeadingZeros(w) - 31
      val b = bucket.toInt
      if (rho > buf(b)) buf(b) = rho
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(m * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(offset: Int): HllRegisters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllRegisters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}
