package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator for absolute-scale spot-benches (BENCH_SF1.md):
  * replicates the driver's sf0.1 tables N× with key shifts, producing an
  * sf≈1 dataset whose LOCAL structure (duplicate clusters, join fan-out,
  * group cardinalities per key) matches the original — so a query's cost
  * model is exercised at 10× the rows without changing any query.
  *
  * Replication rules:
  *  - join/group keys shift by `rep * (max(key)+1)` so replicas never
  *    collide and referential structure (orders⋈customer, lineitem⋈orders)
  *    replicates intact;
  *  - document text gets each token prefixed with a replica tag (rep > 0),
  *    keeping replicas' token sets disjoint: near-dup clusters stay the
  *    size the corpus generator intended instead of every doc gaining
  *    factor-1 artificial twins (which would grow the verified-pair mass
  *    quadratically by construction, not by scale);
  *  - non-key attributes (dates, prices, langs) repeat unchanged;
  *  - output is repartitioned to multiple files so scans get real splits
  *    (the sf0.1 fixtures are single-row-group — fine for correctness,
  *    wrong for a parallelism measurement).
  *
  * Usage: ScaleUp <inDir> <outDir> <factor>   (tables not needing shifts
  * are copied through unchanged).
  */
object ScaleUp {

  /** Per-replica ±1 dimension flips for embedding replication: flipping a
    * fixed sign pattern across a whole replica preserves every
    * within-replica inner product (both vectors flip identically) while
    * decorrelating cross-replica pairs — replicas behave like fresh corpus
    * mass for LSH/IVF bucketing instead of 10 exact copies whose identical
    * signatures would inflate every bucket quadratically. Sign derivation
    * shared with q95's JL matrix (graft.functions.Hashing.md5Sign).
    */
  private def signFlips(factor: Int, dims: Int): Seq[Seq[Float]] =
    (0 until factor).map { r =>
      (0 until dims).map { i =>
        if (r == 0) 1.0f // replica 0 stays the original data
        else graft.functions.Hashing.md5Sign(s"$r:$i").toFloat
      }
    }

  private def replicate(s: SparkSession, df: DataFrame, factor: Int,
      shiftKeys: Seq[String], tagTextTokens: Boolean = false,
      withRep: DataFrame => DataFrame = identity,
      fixedOffsets: Map[String, Long] = Map.empty): DataFrame = {
    // fixedOffsets pins a key's shift to ANOTHER table's offset so foreign
    // keys replicate in lockstep (events.user_id must move by customer's
    // c_custkey offset, not by its own max — the event stream only touches
    // a prefix of the customer keys)
    val offsets = shiftKeys.map { k =>
      k -> fixedOffsets.getOrElse(k, df.agg(max(col(k))).head().getLong(0) + 1L)
    }.toMap
    val reps = s.range(factor).select(col("id").as("rep"))
    val rep = df.crossJoin(broadcast(reps))
    val shifted = offsets.foldLeft(rep) { case (acc, (k, off)) =>
      acc.withColumn(k, col(k) + col("rep") * lit(off))
    }
    val tagged =
      if (!tagTextTokens) shifted
      else shifted
        .withColumn("text",
          when(col("rep") === 0, col("text"))
            .otherwise(array_join(transform(split(col("text"), "\\s+"),
              t => concat(lit("r"), col("rep"), lit("_"), t)), " ")))
        // cast: length() is int32; the fixture column is int64, and a
        // narrowed replica schema would break Row.getAs[Long] consumers
        .withColumn("n_chars", length(col("text")).cast("long"))
    withRep(tagged).drop("rep")
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def in(t: String) = spark.read.parquet(s"$inDir/$t.parquet")
    def out(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    out(replicate(spark, in("documents"), factor, Seq("doc_id"),
      tagTextTokens = true), "documents", 32)
    // Foreign keys shift by the REFERENCED table's offset, never by the
    // referencing column's own max: the fixtures happen to have
    // max(o_custkey) == max(c_custkey), but a corpus where the top
    // customer has no orders (TPC-H proper leaves ~1/3 of customers
    // orderless) would silently rewire every replica's joins.
    val custOffset = in("customer").agg(max("c_custkey")).head().getLong(0) + 1L
    val orderOffset = in("orders").agg(max("o_orderkey")).head().getLong(0) + 1L
    out(replicate(spark, in("orders"), factor, Seq("o_orderkey", "o_custkey"),
      fixedOffsets = Map("o_custkey" -> custOffset)), "orders", 16)
    out(replicate(spark, in("lineitem"), factor, Seq("l_orderkey"),
      fixedOffsets = Map("l_orderkey" -> orderOffset)), "lineitem", 32)
    // customer names get a per-replica tag of the replica digit repeated
    // 3× — any two tags are Levenshtein ≥ 3 apart, so replicas of the
    // same name are NOT fuzzy-match pairs at threshold 2 and the match
    // output scales with the corpus instead of quadratically (same
    // rationale as the document-token tags; requires factor ≤ 10)
    require(factor <= 10, "single-digit replica tags need factor <= 10")
    out(replicate(spark, in("customer"), factor, Seq("c_custkey"),
      withRep = df => df.withColumn("c_name",
        when(col("rep") === 0, col("c_name"))
          .otherwise(concat(repeat(col("rep").cast("string"), 3), lit("_"),
            col("c_name"))))), "customer", 8)
    // embeddings: shift vec_id and sign-flip dimensions per replica (the
    // fixture embeddings are 64-dim float32)
    val embDims = 64
    val flips = signFlips(factor, embDims).map(r => array(r.map(lit): _*))
    out(replicate(spark, in("embeddings"), factor, Seq("vec_id"))
      // rep is recoverable from the shifted id: vec_id / (max+1) — but the
      // flip must apply before the rep column drops, so re-derive it here
      .withColumn("rep",
        (col("vec_id") / (in("embeddings").agg(max("vec_id")).head().getLong(0) + 1L))
          .cast("int"))
      .withColumn("embedding",
        zip_with(col("embedding"),
          element_at(array(flips: _*), col("rep") + 1),
          (x, f) => x * f))
      .drop("rep"), "embeddings", 8)
    // events: user_id shifts by CUSTOMER's offset (FK lockstep); event
    // timestamps repeat unchanged — replicas overlay in time, i.e. the
    // stream gets 10× denser rather than 10× longer, which is how a
    // bigger deployment actually loads its windows and state stores.
    // (ts round-trips as INT64 under the session's nanosAsLong flag; the
    // readers convert ns→µs themselves either way.)
    out(replicate(spark, in("events"), factor, Seq("event_id", "user_id"),
      fixedOffsets = Map("user_id" -> custOffset)), "events", 16)
    // pass-through for everything a spot-bench query might touch lightly
    Seq("region", "nation", "supplier", "part")
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$inDir/$t.parquet"),
          java.nio.file.Paths.get(s"$outDir/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    spark.stop()
  }
}
