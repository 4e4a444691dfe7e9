package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `simhash16(hashes)` — the 16-bit SimHash signature of an
  * `array<int>` of token hashes, in ONE walk.
  *
  * The expression form (graft.operators.Text.simhashes) evaluates 16
  * separate `aggregate` lambdas, each re-walking the token-hash array —
  * 16 passes plus per-element lambda dispatch, per document. This native
  * expression accumulates all 16 bit votes in a single allocation-cheap
  * pass inside whole-stage codegen: bit i of the result is set iff
  * Σ_tokens (±1 by bit i of the token hash) > 0 — bit-identical to the
  * 16-aggregate formula and to the DuckDB oracle mirror
  * (Text.duckSimhashBits), which both stay as the cross-engine spec.
  *
  * Contract: null ARRAY yields null; elements must be non-null (the
  * producing `transform(split(...))` projection cannot emit null tokens).
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<int>, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](16)
    var k = 0
    while (k < n) {
      val h = arr.getInt(k)
      var i = 0
      while (i < 16) {
        votes(i) += (((h >> i) & 1) << 1) - 1 // +1 if bit set, else -1
        i += 1
      }
      k += 1
    }
    var sig = 0
    var i = 0
    while (i < 16) {
      if (votes(i) > 0) sig |= 1 << i
      i += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[16];
         |for (int $k = 0; $k < $n; $k++) {
         |  final int $h = $a.getInt($k);
         |  for (int $i = 0; $i < 16; $i++) {
         |    $votes[$i] += ((($h >> $i) & 1) << 1) - 1;
         |  }
         |}
         |int $sig = 0;
         |for (int $i = 0; $i < 16; $i++) {
         |  if ($votes[$i] > 0) $sig |= 1 << $i;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}
