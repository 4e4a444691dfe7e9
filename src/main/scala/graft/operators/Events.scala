package graft.operators

import graft.{Q, QueryModule}
import graft.functions.Exact._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the `events` table (SURVEY.md §2.9
  * — the reference has no streaming; this is the batch-verifiable subset of
  * the Structured Streaming slice in graft.streaming). `F.window` is a
  * stateless projection (each row maps to its window starts) followed by an
  * ordinary hash aggregate — it scales exactly like a group-by and the
  * grouping key (window, type) is shuffle-balanced even when one type is hot.
  */
object Events extends QueryModule {

  /** q22 — tumbling 1-hour window: count + exact sum per (window, type).
    * Oracle: DuckDB time_bucket.
    */
  val tumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .orderBy("window_start", "event_type")

  /** q23 — sliding window (1 hour, slide 30 min): each event lands in
    * exactly size/slide = 2 windows. Oracle reproduces Spark's window
    * assignment as a two-bucket UNION ALL.
    */
  val sliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")

  /** q24 — JSON field extraction from the string `props` column
    * (get_json_object is codegen'd; no UDF).
    */
  val jsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id")

  def queries: Map[String, Q] = Map(
    "q22_window_tumbling" -> tumbling,
    "q23_window_sliding" -> sliding,
    "q24_json_extract" -> jsonExtract)

  def oracles: Map[String, String] = Map(
    "q22_window_tumbling" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q23_window_sliding" ->
      """WITH assigned AS (
        |  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) AS TIMESTAMP) AS window_start,
        |         event_type FROM events
        |  UNION ALL
        |  SELECT CAST(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS TIMESTAMP),
        |         event_type FROM events
        |)
        |SELECT window_start, event_type, count(*) AS n
        |FROM assigned GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q24_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin)
}
