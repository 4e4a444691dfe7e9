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

  def queries: Map[String, Q] = Map("q48_geo_wkt" -> wktParse)

  def oracles: Map[String, String] = Map(
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
