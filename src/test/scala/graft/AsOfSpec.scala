package graft

import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def nanos(s: String): Long = ts(s).getTime * 1000000L

  test("q60 as-of join picks the latest order at-or-before each event") {
    val dir = java.nio.file.Files.createTempDirectory("graftasof").toString
    Seq(
      // user 1: two orders, the second also has a same-day twin (tie)
      (100L, 1L, "O", 10.0, ts("2024-01-10 00:00:00"), "1-URGENT"),
      (101L, 1L, "O", 11.0, ts("2024-02-10 00:00:00"), "1-URGENT"),
      (102L, 1L, "O", 12.0, ts("2024-02-10 00:00:00"), "1-URGENT"),
      // user 2: one order, after that user's only event
      (200L, 2L, "O", 20.0, ts("2024-06-01 00:00:00"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, nanos("2024-01-15 12:00:00"), 1L, "click", 1.0, "{}"), // after first order only
      (2L, nanos("2024-02-10 00:00:00"), 1L, "click", 1.0, "{}"), // exactly at order ts → inclusive, tie → max key
      (3L, nanos("2024-03-01 00:00:00"), 1L, "click", 1.0, "{}"), // after both
      (4L, nanos("2024-05-01 00:00:00"), 2L, "view", 1.0, "{}"), // before user 2's order
      (5L, nanos("2024-05-01 00:00:00"), 9L, "view", 1.0, "{}")) // user with no orders
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q60_asof_join")(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) === Some(100L))
    assert(out(2L) === Some(102L), "inclusive match + max-orderkey tie rule")
    assert(out(3L) === Some(102L))
    assert(out(4L) === None, "no order at-or-before the event")
    assert(out(5L) === None, "customer with no orders at all")
  }

  test("q60 on fixtures: every matched order_date <= its event time") {
    val joined = SparkEntry.queries("q60_asof_join")(spark, sf)
      .join(graft.sources.Tables.events(spark, sf).select($"event_id", $"ts"), "event_id")
    assert(joined.count() > 0)
    // comparison stays in Spark: fixture o_orderdate is TIMESTAMP_NTZ while
    // event ts is TIMESTAMP (both UTC in this session), so driver-side Java
    // types would differ (LocalDateTime vs Instant)
    val violations = joined
      .filter($"order_date".isNotNull &&
        $"order_date".cast("timestamp") > $"ts")
      .count()
    assert(violations === 0L)
  }
}
