package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDF, no driver-side math, so the expressions stay inside whole-stage
  * codegen and distribute trivially.
  *
  * Precision contract: float inputs are widened to double before any
  * multiply (float*float is exact in double), and accumulation is the
  * left-to-right order both Spark's `aggregate` and DuckDB's list kernels
  * use, so cosine scores agree with the oracle to the last few ulps; query
  * outputs round to 4 dp on both sides.
  */
object Vectors {
  /** Σ a_i * b_i in double precision. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Σ a_i^2 in double precision. */
  def sqNormD(a: Column): Column =
    aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity of two float-array columns, in double. */
  def cosineD(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(sqNormD(a)) * sqrt(sqNormD(b)))

  /** Cosine given a precomputed squared norm for each side — lets the
    * norm be computed once per row before a pairwise join instead of once
    * per pair (the O(n*k) term that matters at 100 TB).
    */
  def cosineWithNorms(dot: Column, sqNormA: Column, sqNormB: Column): Column =
    dot / (sqrt(sqNormA) * sqrt(sqNormB))
}
