package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical time-series enrichment
  * operator Spark lacks as a built-in (beyond-reference extension,
  * SURVEY.md §7 M5): match each event to the LATEST order of the same
  * customer at-or-before the event time.
  *
  * The naive formulation is a range join (`e.uid = o.uid AND o.t <= e.t`
  * plus a per-event max) — a BroadcastNestedLoop/explosion at scale. The
  * scalable shape used here is union+window ("piecewise merge join"):
  *  1. tag both sides and union them on (key, time) — a plain columnar
  *     union, no pairing;
  *  2. one shuffle on the key + one per-partition sort by (time, tag);
  *  3. `last(order, ignoreNulls)` over an unbounded-preceding running
  *     frame carries the most recent order forward to every event row.
  * Total cost: ONE shuffle of events+orders and a sort — linear, no pair
  * explosion, and identical on a 1000-executor cluster (the window
  * partitions by customer, so state never crosses executors).
  *
  * Determinism: several orders can share (customer, date), so the order
  * side is first reduced to one row per (customer, date) keeping the max
  * order key — the same tie rule the DuckDB `ASOF JOIN` oracle gets via
  * pre-aggregation. Events at the exact order timestamp match it
  * (at-or-before = inclusive): the order row sorts first at equal time
  * because its tag is 0.
  */
object AsOf extends QueryModule {

  /** q60 — events as-of joined to orders (left: unmatched events keep a
    * null order).
    */
  val asofJoin: Q = (s, d) => {
    val orders = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("uid"), col("o_orderdate").as("t"))
      .agg(max("o_orderkey").as("order_id"))
    val ordSide = orders.select(
      col("uid"), col("t"), lit(0).as("tag"),
      struct(col("order_id"), col("t").as("order_date")).as("ord"),
      lit(null).cast("long").as("event_id"))
    val evtSide = Tables.events(s, d).select(
      col("user_id").as("uid"), col("ts").as("t"), lit(1).as("tag"),
      lit(null).cast(ordSide.schema("ord").dataType).as("ord"),
      col("event_id"))
    val w = Window.partitionBy("uid").orderBy(col("t"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordSide.unionByName(evtSide)
      .withColumn("last_ord", last(col("ord"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("uid").as("user_id"),
        col("last_ord.order_id").as("order_id"),
        col("last_ord.order_date").as("order_date"))
      .orderBy("event_id")
  }

  def queries: Map[String, Q] = Map("q60_asof_join" -> asofJoin)

  def oracles: Map[String, String] = Map(
    "q60_asof_join" ->
      """WITH o AS (SELECT o_custkey AS uid, o_orderdate AS t,
        |  max(o_orderkey) AS order_id FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.order_id, o.t AS order_date
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.uid AND e.ts >= o.t
        |ORDER BY e.event_id""".stripMargin)
}
