package graft.operators

import graft.{Q, QueryModule}
import graft.functions.Vectors._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (ArrayType(FloatType),
  * dim 64) — beyond-reference extension (SURVEY.md §7 M5).
  *
  * Scale design:
  *  - squared norms are computed ONCE per row before any pairwise join
  *    (O(n·dim)), so a pair costs one dot product, not three;
  *  - q31 brute-force kNN broadcasts the (tiny) query set against the full
  *    corpus — O(n·k) work, no shuffle of the corpus, the right baseline
  *    even at 100 TB when k is small;
  *  - q32 is the scale path: sign-LSH bucketing (hyperplanes = coordinate
  *    axes of the leading dims) turns all-pairs search into an equi-join on
  *    the bucket key — shuffle-partitioned by bucket, each bucket searched
  *    locally; more planes/multi-probe trade recall for cost;
  *  - q36 embedding-cosine near-dup does threshold pairing; at scale it
  *    composes the q32 blocking with the q36 predicate.
  */
object Similarity extends QueryModule {

  /** vec_id, embedding, precomputed squared norm. */
  private def base(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        sqNormD(col("embedding")).as("sq"))

  /** Sign-of-leading-dims LSH bucket id (8 planes → 256 buckets). */
  private def bucketCol: org.apache.spark.sql.Column =
    (0 until 8).map { i =>
      when(element_at(col("embedding"), i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** q31 — brute-force cosine top-5 for query vectors vec_id < 5.
    * Ranking keys round the raw cosine to 9 dp first: Spark's left-fold
    * aggregate and DuckDB's list kernel can differ at ulp level, and a raw
    * double rank would let near-ties order differently per engine.
    */
  val knnBrute: Q = (s, d) => {
    val corpus = base(s, d)
    val queries = corpus.filter(col("vec_id") < 5).select(
      col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      col("sq").as("q_sq"))
    val sim = cosineWithNorms(
      dotD(col("q_emb"), col("embedding")), col("q_sq"), col("sq"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim9").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim9", round(sim, 9))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rn"),
        round(col("sim9"), 4).as("sim"))
      .orderBy("query_id", "rn")
  }

  /** q32 — LSH-bucketed approximate NN: nearest in-bucket neighbor per
    * vector. The self-join is an equi-join on the bucket key (shuffle
    * hash / sort-merge by bucket), never an n² cross join.
    */
  val lshAnn: Q = (s, d) => {
    val b = base(s, d).withColumn("bucket", bucketCol)
    val l = b.alias("l")
    val r = b.alias("r")
    val sim = cosineWithNorms(
      dotD(col("l.embedding"), col("r.embedding")), col("l.sq"), col("r.sq"))
    val w = Window.partitionBy(col("l.vec_id"))
      .orderBy(col("sim9").desc, col("r.vec_id"))
    l.join(r,
        col("l.bucket") === col("r.bucket") && col("l.vec_id") =!= col("r.vec_id"))
      .withColumn("sim9", round(sim, 9))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l.vec_id").as("vec_id"), col("r.vec_id").as("neighbor_id"),
        round(col("sim9"), 4).as("sim"), col("l.bucket").cast("int").as("bucket"))
      .orderBy("vec_id")
  }

  /** q36 — embedding-cosine near-dup pairs (threshold 0.4 on this corpus).
    * Brute all-pairs here (the corpus is small); the 100 TB path runs the
    * same predicate inside q32's bucket join.
    */
  val embedNearDup: Q = (s, d) => {
    val l = base(s, d).alias("l")
    val r = base(s, d).alias("r")
    val sim = cosineWithNorms(
      dotD(col("l.embedding"), col("r.embedding")), col("l.sq"), col("r.sq"))
    l.join(r, col("l.vec_id") < col("r.vec_id"))
      .withColumn("sim9", round(sim, 9))
      .filter(col("sim9") >= 0.4)
      .select(col("l.vec_id").as("vec_id_1"), col("r.vec_id").as("vec_id_2"),
        round(col("sim9"), 4).as("sim"))
      .orderBy("vec_id_1", "vec_id_2")
  }

  /** q47 — IVF-style approximate NN (the second scale path besides q32's
    * sign-LSH): a small set of coarse centroids partitions the corpus into
    * cells; each vector is assigned to its nearest centroid (broadcast
    * cross-join against the 16 pivots — O(n·C), no shuffle of the corpus),
    * then neighbor search is an equi-join on cell_id. Centroids here are
    * the first 16 vectors by vec_id — deterministic, so the whole index is
    * DuckDB-reproducible; a production build swaps in k-means centroids
    * (graft.ml) without changing the plan shape, and multi-probe = top-P
    * cells per query instead of top-1.
    */
  val ivfAnn: Q = (s, d) => {
    val corpus = base(s, d)
    val pivots = corpus.filter(col("vec_id") < 16).select(
      col("vec_id").as("pivot_id"), col("embedding").as("p_emb"),
      col("sq").as("p_sq"))
    val psim = cosineWithNorms(
      dotD(col("embedding"), col("p_emb")), col("sq"), col("p_sq"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("psim9").desc, col("pivot_id"))
    val assigned = corpus.crossJoin(broadcast(pivots))
      .withColumn("psim9", round(psim, 9))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("sq"),
        col("pivot_id").as("cell_id"))
    val l = assigned.alias("l")
    val r = assigned.alias("r")
    val sim = cosineWithNorms(
      dotD(col("l.embedding"), col("r.embedding")), col("l.sq"), col("r.sq"))
    val w = Window.partitionBy(col("l.vec_id"))
      .orderBy(col("sim9").desc, col("r.vec_id"))
    l.join(r,
        col("l.cell_id") === col("r.cell_id") && col("l.vec_id") =!= col("r.vec_id"))
      .withColumn("sim9", round(sim, 9))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l.vec_id").as("vec_id"),
        col("l.cell_id").cast("int").as("cell_id"),
        col("r.vec_id").as("neighbor_id"), round(col("sim9"), 4).as("sim"))
      .orderBy("vec_id")
  }

  def queries: Map[String, Q] = Map(
    "q31_knn_brute" -> knnBrute,
    "q32_lsh_ann" -> lshAnn,
    "q36_embed_neardup" -> embedNearDup,
    "q47_ivf_ann" -> ivfAnn)

  private val duckCos =
    "list_cosine_similarity(%s.embedding::DOUBLE[], %s.embedding::DOUBLE[])"

  private val duckBucket = (0 until 8).map { i =>
    s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)"
  }.mkString(" + ")

  def oracles: Map[String, String] = Map(
    "q31_knn_brute" ->
      s"""SELECT query_id, neighbor_id, CAST(rn AS INT) AS rn, round(sim9, 4) AS sim
         |FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${duckCos.format("q", "c")}, 9) AS sim9,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${duckCos.format("q", "c")}, 9) DESC, c.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5
         |) WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "q32_lsh_ann" ->
      s"""WITH b AS (SELECT vec_id, embedding, $duckBucket AS bucket FROM embeddings)
         |SELECT vec_id, neighbor_id, round(sim9, 4) AS sim, CAST(bucket AS INT) AS bucket
         |FROM (
         |  SELECT l.vec_id AS vec_id, r.vec_id AS neighbor_id, l.bucket AS bucket,
         |    round(${duckCos.format("l", "r")}, 9) AS sim9,
         |    row_number() OVER (PARTITION BY l.vec_id
         |      ORDER BY round(${duckCos.format("l", "r")}, 9) DESC, r.vec_id) AS rn
         |  FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id
         |) WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q36_embed_neardup" ->
      s"""SELECT l.vec_id AS vec_id_1, r.vec_id AS vec_id_2,
         |  round(round(${duckCos.format("l", "r")}, 9), 4) AS sim
         |FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
         |WHERE round(${duckCos.format("l", "r")}, 9) >= 0.4
         |ORDER BY vec_id_1, vec_id_2""".stripMargin,
    "q47_ivf_ann" ->
      s"""WITH assigned AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT v.vec_id, v.embedding, p.vec_id AS cell_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY round(${duckCos.format("v", "p")}, 9) DESC, p.vec_id) AS arn
         |    FROM embeddings v CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 16) p
         |  ) WHERE arn = 1)
         |SELECT vec_id, CAST(cell_id AS INT) AS cell_id, neighbor_id,
         |  round(sim9, 4) AS sim
         |FROM (
         |  SELECT l.vec_id AS vec_id, l.cell_id AS cell_id,
         |    r.vec_id AS neighbor_id,
         |    round(${duckCos.format("l", "r")}, 9) AS sim9,
         |    row_number() OVER (PARTITION BY l.vec_id
         |      ORDER BY round(${duckCos.format("l", "r")}, 9) DESC, r.vec_id) AS rn
         |  FROM assigned l JOIN assigned r
         |  ON l.cell_id = r.cell_id AND l.vec_id <> r.vec_id
         |) WHERE rn = 1 ORDER BY vec_id""".stripMargin)
}
