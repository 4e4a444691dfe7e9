package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond q59's connected components (reference
  * scope: the reference has no graph surface; this is part of the
  * beyond-reference large-pipeline slice, SURVEY.md §7 M5 — link-graph
  * ranking is how a training-data pipeline scores page/document importance
  * for sampling weights).
  *
  * PageRank here is the shuffle-only formulation GraphX itself lowers to:
  * per-iteration `edges ⋈ ranks → groupBy(dst).sum`, i.e. one keyed
  * equi-join plus one hash aggregate per iteration — no driver-side graph,
  * no collect. The edge list (with out-degrees attached) is staged to
  * parquet ONCE and re-scanned per iteration, the same lineage discipline
  * as q59's CC loop: without staging, every iteration would recompute the
  * upstream `distinct`, and leaf statistics would be opaque to AQE.
  *
  * All rank arithmetic is 64-bit fixed-point (scale 1e6) with integer
  * `div` — floating-point sums are addition-order-dependent, so a double
  * formulation could never hash-match an oracle; the integer one is exact
  * and engine-independent. Dangling-node mass (sinks contribute nothing)
  * is dropped, the convention of the original PageRank paper's simplest
  * variant, mirrored in the oracle.
  */
object Graph extends QueryModule {

  private val iters = 3
  private val initRank = 1000000L // fixed-point 1.0
  private val partOffset = 10000000L

  /** q106 — 3-iteration PageRank over the order→part bipartite purchase
    * graph (distinct lineitem FK pairs; part nodes offset into their own
    * id space). Emits the top-10 nodes by final rank — a
    * TakeOrderedAndProject, so output stays O(k) no matter the graph size.
    */
  val pageRank: Q = (s, d) => {
    val raw = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("src"),
        (col("l_partkey") + lit(partOffset)).as("dst"))
      .distinct()
    val withDeg = raw.join(
      raw.groupBy("src").agg(count(lit(1)).as("out_deg")), "src")
    val tmp = graft.Scratch.dir("graft_pr_edges") // reaped at JVM exit
    withDeg.write.mode("overwrite").parquet(tmp)
    val edges = s.read.parquet(tmp)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val tmpN = graft.Scratch.dir("graft_pr_nodes")
    nodes.write.mode("overwrite").parquet(tmpN)
    val stagedNodes = s.read.parquet(tmpN)

    var ranks = stagedNodes.select(col("node"), lit(initRank).as("pr"))
    for (_ <- 1 to iters) {
      val inbound = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div out_deg").as("c"))
        .groupBy("dst").agg(sum("c").as("m"))
      ranks = stagedNodes.join(inbound, stagedNodes("node") === inbound("dst"), "left")
        .select(stagedNodes("node"),
          expr("CAST(150000 + (85 * coalesce(m, CAST(0 AS BIGINT))) div 100 AS BIGINT)")
            .as("pr"))
    }
    ranks.orderBy(col("pr").desc, col("node")).limit(10)
  }

  def queries: Map[String, Q] = Map("q106_pagerank" -> pageRank)

  def oracles: Map[String, String] = Map(
    "q106_pagerank" -> {
      val iterCtes = (1 to iters).map { i =>
        s"""r$i AS (SELECT n.node,
           |  CAST(150000 + (85 * COALESCE(i.m, 0)) // 100 AS BIGINT) AS pr
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst, SUM(r.pr // e.out_deg) AS m
           |    FROM edges e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1) i
           |  ON n.node = i.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH edges0 AS (
         |  SELECT DISTINCT l_orderkey AS src, l_partkey + $partOffset AS dst
         |  FROM lineitem),
         |deg AS (SELECT src, count(*) AS out_deg FROM edges0 GROUP BY 1),
         |edges AS (SELECT e.src, e.dst, d.out_deg
         |  FROM edges0 e JOIN deg d ON e.src = d.src),
         |nodes AS (SELECT src AS node FROM edges0
         |  UNION SELECT dst FROM edges0),
         |r0 AS (SELECT node, CAST($initRank AS BIGINT) AS pr FROM nodes),
         |$iterCtes
         |SELECT node, pr FROM r$iters ORDER BY pr DESC, node LIMIT 10""".stripMargin
    })
}
