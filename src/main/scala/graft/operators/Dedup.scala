package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, RegexTokenizer}
import org.apache.spark.sql.functions._

/** MinHash+LSH near-duplicate detection — the shingle→minhash→band→
  * bucket-join pipeline (SURVEY.md §7 M5) via spark.ml's MinHashLSH.
  *
  * Scale shape: tokenize + HashingTF are stateless per-row maps (no fit
  * pass, no vocabulary shuffle — deterministic murmur hashing);
  * approxSimilarityJoin hashes each doc into numHashTables band buckets and
  * equi-joins on (band, bucket), so candidate generation is linear-ish in
  * corpus size instead of n². Not SQL-expressible (rows-only check); the
  * oracle-checked near-dup surface is q30 (Jaccard) and q38 (SimHash).
  */
object Dedup extends QueryModule {

  /** q37 — MinHashLSH candidate pairs at Jaccard distance <= 0.9, reported
    * as (n_pairs, min/avg distance) so the result is a stable 1-row frame
    * even when the corpus has no true near-dups.
    */
  val minhashNearDup: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val tokenized = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens").setPattern("\\s+")
      .transform(docs)
    val vectorized = new HashingTF()
      .setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
      .transform(tokenized)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(3).setSeed(42)
    val model = lsh.fit(vectorized)
    val pairs = model
      .approxSimilarityJoin(vectorized, vectorized, 0.9, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      coalesce(round(min("jaccard_dist"), 4), lit(-1.0)).as("min_dist"),
      coalesce(round(avg("jaccard_dist"), 4), lit(-1.0)).as("avg_dist"))
  }

  def queries: Map[String, Q] = Map("q37_minhash_neardup" -> minhashNearDup)
  def oracles: Map[String, String] = Map.empty // LSH internals: rows-only
}
