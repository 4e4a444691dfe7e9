package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo/WKT parsing (SURVEY.md §2.1 S6 — reference Dataset.py:40-47, where
  * district polygons arrive as WKT strings and are converted for the map
  * layer; consumed at Dataset.py:297-323). The reference does it with
  * shapely on the driver; here the parse is Spark-native and distributed:
  * `regexp_extract_all` pulls the "lon lat" pairs out of the WKT text, and
  * higher-order functions (`transform` + `aggregate`) compute point count
  * and centroid per polygon — all codegen'd expressions, no UDF, no
  * driver-side loop, linear in the number of polygons.
  *
  * The fixture schema has no WKT column, so q48 synthesizes one per
  * customer from integer key arithmetic with literal fractional digits
  * (never floating-point formatting, which could render differently across
  * engines) — the DuckDB oracle builds the identical string and must parse
  * it to the identical centroid, which is exactly the parity that matters.
  */
object Geo extends QueryModule {

  private val pairRe = "(-?\\d+\\.\\d+) (-?\\d+\\.\\d+)"

  /** Closed 4-point WKT polygon from two integer seed columns. */
  private def wktCol(a: Column, b: Column): Column = concat(
    lit("POLYGON (("),
    a.cast("string"), lit(".10 "), b.cast("string"), lit(".20, "),
    (a + 1).cast("string"), lit(".30 "), b.cast("string"), lit(".40, "),
    (a + 1).cast("string"), lit(".50 "), (b + 1).cast("string"), lit(".60, "),
    a.cast("string"), lit(".10 "), b.cast("string"), lit(".20))"))

  private def meanOf(arr: Column): Column =
    round(
      aggregate(transform(arr, x => x.cast("double")), lit(0.0d), (acc, x) => acc + x)
        / size(arr), 6)

  /** q48 — WKT polygon parse: extract (lon, lat) pairs, count points,
    * first vertex, centroid (mean of all listed vertices, closing vertex
    * included — same convention on both engines).
    */
  val wktParse: Q = (s, d) => {
    val seeded = Tables.customer(s, d).select(
      col("c_custkey"),
      wktCol(col("c_custkey") % 360 - 180, col("c_custkey") % 170 - 85).as("wkt"))
    val lons = regexp_extract_all(col("wkt"), lit(pairRe), lit(1))
    val lats = regexp_extract_all(col("wkt"), lit(pairRe), lit(2))
    seeded
      .withColumn("lons", lons).withColumn("lats", lats)
      .select(
        col("c_custkey"),
        size(col("lons")).as("n_points"),
        element_at(col("lons"), 1).cast("double").as("first_lon"),
        element_at(col("lats"), 1).cast("double").as("first_lat"),
        meanOf(col("lons")).as("centroid_lon"),
        meanOf(col("lats")).as("centroid_lat"))
      .orderBy("c_custkey")
  }

  /** q107 — grid-bucketed spatial radius join: "every supplier depot within
    * distance R of a customer site". The classic spatial-join problem that
    * a naive formulation writes as a cartesian with a distance filter —
    * O(n·m) and a nested loop at any scale. Grid bucketing turns it into
    * an EQUI-join: cell size = R, each right-side point replicated into
    * its 3×3 neighborhood (a constant ×9 — the standard grid/partition
    * join of PostGIS/Sedona), so every true pair shares a cell key and the
    * join shuffles on (cellx, celly) like any other key. The exact
    * squared-distance predicate then prunes the ≤9-cell candidate surplus.
    * All-integer coordinates (keys × primes mod 1000) keep both engines
    * bit-exact — no floating-point distance. The supplier side is a dim
    * table here so it broadcasts; at two-big-sides scale the same plan
    * shuffles both sides on the cell key.
    */
  val gridJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      (col("c_custkey") * lit(7919L) % 1000L).as("x"),
      (col("c_custkey") * lit(104729L) % 1000L).as("y"))
      .withColumn("cx", expr("x div 40"))
      .withColumn("cy", expr("y div 40"))
    val supp = Tables.supplier(s, d).select(
      col("s_suppkey"),
      (col("s_suppkey") * lit(7577L) % 1000L).as("sx"),
      (col("s_suppkey") * lit(99991L) % 1000L).as("sy"))
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .withColumn("jx", expr("sx div 40") + col("dx"))
      .withColumn("jy", expr("sy div 40") + col("dy"))
    cust.join(broadcast(supp),
        col("cx") === col("jx") && col("cy") === col("jy"))
      .withColumn("dist2",
        (col("x") - col("sx")) * (col("x") - col("sx"))
          + (col("y") - col("sy")) * (col("y") - col("sy")))
      .filter(col("dist2") <= 1600L)
      .select(col("c_custkey"), col("s_suppkey"), col("dist2"))
      .orderBy("c_custkey", "s_suppkey")
  }

  def queries: Map[String, Q] = Map(
    "q48_geo_wkt" -> wktParse,
    "q107_grid_join" -> gridJoin)

  def oracles: Map[String, String] = Map(
    "q107_grid_join" ->
      """WITH cust AS (
        |  SELECT c_custkey,
        |    (c_custkey * 7919) % 1000 AS x, (c_custkey * 104729) % 1000 AS y
        |  FROM customer),
        |c2 AS (SELECT *, x // 40 AS cx, y // 40 AS cy FROM cust),
        |supp AS (
        |  SELECT s_suppkey,
        |    (s_suppkey * 7577) % 1000 AS sx, (s_suppkey * 99991) % 1000 AS sy
        |  FROM supplier),
        |nb AS (
        |  SELECT s.*, sx // 40 + dxs.dx AS jx, sy // 40 + dys.dy AS jy
        |  FROM supp s,
        |    (SELECT unnest(range(-1, 2)) AS dx) dxs,
        |    (SELECT unnest(range(-1, 2)) AS dy) dys)
        |SELECT c.c_custkey, nb.s_suppkey,
        |  (c.x - nb.sx) * (c.x - nb.sx) + (c.y - nb.sy) * (c.y - nb.sy)
        |    AS dist2
        |FROM c2 c JOIN nb ON c.cx = nb.jx AND c.cy = nb.jy
        |WHERE (c.x - nb.sx) * (c.x - nb.sx) + (c.y - nb.sy) * (c.y - nb.sy)
        |  <= 1600
        |ORDER BY c_custkey, s_suppkey""".stripMargin,
    "q48_geo_wkt" ->
      """WITH seeded AS (
        |  SELECT c_custkey,
        |    'POLYGON ((' ||
        |    (c_custkey % 360 - 180) || '.10 ' || (c_custkey % 170 - 85) || '.20, ' ||
        |    (c_custkey % 360 - 179) || '.30 ' || (c_custkey % 170 - 85) || '.40, ' ||
        |    (c_custkey % 360 - 179) || '.50 ' || (c_custkey % 170 - 84) || '.60, ' ||
        |    (c_custkey % 360 - 180) || '.10 ' || (c_custkey % 170 - 85) || '.20))'
        |      AS wkt
        |  FROM customer),
        |parsed AS (
        |  SELECT c_custkey,
        |    regexp_extract_all(wkt, '(-?\d+\.\d+) (-?\d+\.\d+)', 1) AS lons,
        |    regexp_extract_all(wkt, '(-?\d+\.\d+) (-?\d+\.\d+)', 2) AS lats
        |  FROM seeded)
        |SELECT c_custkey,
        |  CAST(len(lons) AS INT) AS n_points,
        |  lons[1]::DOUBLE AS first_lon,
        |  lats[1]::DOUBLE AS first_lat,
        |  round(list_aggregate(list_transform(lons, x -> x::DOUBLE), 'sum') / len(lons), 6)
        |    AS centroid_lon,
        |  round(list_aggregate(list_transform(lats, x -> x::DOUBLE), 'sum') / len(lats), 6)
        |    AS centroid_lat
        |FROM parsed ORDER BY c_custkey""".stripMargin)
}
