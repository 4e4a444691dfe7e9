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

  /** Driver-side md5 hex digest — for deterministic constants computed at
    * plan-build time (q95's sign matrix, ScaleUp's replica flips), NOT for
    * per-row expressions (use [[md5Bucket]] / `functions.md5`).
    */
  def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** ±1 from the parity of the first md5 hex digit of `key` — the shared
    * derivation behind q95's JL sign matrix and ScaleUp's per-replica
    * embedding flips (their agreement is load-bearing: the flips must
    * decorrelate replicas under the SAME hash family the projection uses).
    */
  def md5Sign(key: String): Int =
    if ((Integer.parseInt(md5hex(key).substring(0, 1), 16) & 1) == 0) 1 else -1
}
