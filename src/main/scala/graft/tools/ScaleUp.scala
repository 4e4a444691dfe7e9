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

  private def replicate(s: SparkSession, df: DataFrame, factor: Int,
      shiftKeys: Seq[String], tagTextTokens: Boolean = false): DataFrame = {
    val offsets = shiftKeys.map { k =>
      k -> (df.agg(max(col(k))).head().getLong(0) + 1L)
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
        .withColumn("n_chars", length(col("text")))
    tagged.drop("rep")
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
    out(replicate(spark, in("orders"), factor, Seq("o_orderkey", "o_custkey")),
      "orders", 16)
    out(replicate(spark, in("lineitem"), factor, Seq("l_orderkey")),
      "lineitem", 32)
    out(replicate(spark, in("customer"), factor, Seq("c_custkey")),
      "customer", 8)
    // pass-through for everything a spot-bench query might touch lightly
    Seq("region", "nation", "supplier", "part", "events", "embeddings")
      .foreach { t =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$inDir/$t.parquet"),
          java.nio.file.Paths.get(s"$outDir/$t.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    spark.stop()
  }
}
