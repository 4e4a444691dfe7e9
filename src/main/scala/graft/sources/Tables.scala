package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the fixture star schema (FIXTURES.md).
  *
  * Parquet is self-describing, so no schema inference pass is needed (the
  * reference's CSV `inferSchema=True` at Dataset.py:77 reads the data twice;
  * a production CSV path should pass an explicit StructType — see
  * [[Csv.crimeLikeSchema]]). Column pruning + predicate pushdown reach the
  * scan automatically because every operator stays declarative.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — read it as a long (nanos since epoch) and truncate to a
    * micros timestamp. Integer `div` keeps full precision (a double division
    * would lose bits above 2^53).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once in the
    * session builders (Verify/Bench/SparkSpec) — a reader must not mutate
    * session-global conf as a side effect, because the flag would silently
    * change how every other TIMESTAMP(NANOS) parquet in the session is read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(
      s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores TIMESTAMP(NANOS): set " +
        "spark.sql.legacy.parquet.nanosAsLong=true in the SparkSession builder")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
