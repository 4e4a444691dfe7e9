package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-bucket expressions shared by the sampling/split
  * operators (q75 hash split, q89 stratified sample), with the DuckDB
  * mirror kept next to the Spark form — the two must evolve together or
  * the engines silently diverge on bucket membership.
  */
object Hashing {

  /** Bucket 0..n-1 from the first 8 md5 hex digits of the column's string
    * form — content-independent, stable under repartitioning and re-runs,
    * which seeded `sample()` is not.
    */
  def md5Bucket(c: Column, n: Int): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(n.toLong))

  /** DuckDB mirror of [[md5Bucket]] over a SQL expression string. */
  def duckMd5Bucket(e: String, n: Int): String =
    s"('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 8))::BIGINT % $n"
}
