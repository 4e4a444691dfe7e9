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

  /** Decouple compute parallelism from input splits. A source yielding
    * fewer partitions than half the scheduler's parallelism (the fixture
    * tables are the extreme: single-row-group parquet ⇒ ONE split) pins
    * every downstream map stage — minhash projections, candidate
    * generation — to that handful of tasks, and AQE's broadcast-everything
    * choice at small scale means no later exchange rescues it. One keyed
    * shuffle fans the work out; on a production multi-split source the
    * guard makes this a no-op, so the 100 TB plan pays nothing.
    */
  def fanOut(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // explicit partition count: a bare repartition(col) is re-coalesced by
    // AQE on SIZE (these stages are CPU-heavy but byte-light — 0.6 MB of
    // text fans out to seconds of hashing), while REPARTITION_BY_NUM is
    // respected as a user decision
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target, col(key))
    else df
  }
}
