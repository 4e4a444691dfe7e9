package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns.
  *
  * The hot-path entry points ([[dotD]], [[sqNormD]]) resolve to the native
  * codegen'd Catalyst expressions [[FloatVecDot]]/[[FloatVecSqNorm]]
  * registered by [[graft.GraftExtensions]] — a tight primitive loop inside
  * whole-stage codegen. The higher-order-function formulations are kept as
  * [[dotSlow]]/[[sqNormSlow]]: they are the executable specification (same
  * left-to-right double accumulation, bit-identical results — see
  * SimilaritySpec's parity test) and need no session extension.
  *
  * Precision contract: float inputs are widened to double before any
  * multiply (float*float is exact in double), and accumulation is
  * left-to-right in index order in both formulations and in DuckDB's list
  * kernels, so cosine scores agree with the oracle to the last few ulps;
  * query outputs round to 4 dp on both sides.
  */
object Vectors {
  /** Σ a_i * b_i in double precision (native codegen expression;
    * requires `spark.sql.extensions=graft.GraftExtensions`).
    */
  def dotD(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Σ a_i² in double precision (native codegen expression). */
  def sqNormD(a: Column): Column = call_function("vec_sqnorm", a)

  /** |a ∩ b| of two SORTED DISTINCT long arrays — allocation-free merge
    * walk (native codegen expression, [[SortedIntersectSize]]); the spec
    * twin is `size(array_intersect(a, b))`.
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("sorted_intersect_size", a, b)

  /** 16-bit SimHash of an `array<int>` of token hashes in one walk
    * (native codegen expression, [[Simhash16]]); the spec twin is the
    * 16-aggregate bit formula in graft.operators.Text.
    */
  def simhash16(hashes: Column): Column = call_function("simhash16", hashes)

  /** HOF reference implementation of [[dotD]] — interpreted, allocation
    * per pair; used only as the parity spec and where the extension is
    * not registered.
    */
  def dotSlow(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** HOF reference implementation of [[sqNormD]]. */
  def sqNormSlow(a: Column): Column =
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
