package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the round-7 harness lessons: a failing query must surface as a
  * visible red record (never a silent gap), and fixture schema drift must
  * fail once, loudly, naming the column — not 35 times, confusingly.
  */
class HarnessSpec extends SparkSpec {

  test("Verify.dumpAll records a failing query as _ERROR sentinel + errors row") {
    val out = Files.createTempDirectory("graftverify").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("synthetic failure\nsecond line")
    val ok: (SparkSession, String) => DataFrame =
      (s, d) => graft.sources.Tables.region(s, d)
    val failures = Verify.dumpAll(spark, sf, out,
      Seq("q_ok_probe" -> ok, "q_broken_probe" -> boom))
    // the good query dumped parquet; the broken one left a sentinel, and
    // the failure map carries a bounded one-line message for errors.json
    assert(Files.list(Paths.get(s"$out/q_ok_probe")).anyMatch(_.toString.endsWith(".parquet")))
    assert(Files.exists(Paths.get(s"$out/q_broken_probe/_ERROR")))
    assert(Files.readString(Paths.get(s"$out/q_broken_probe/_ERROR"))
      .contains("synthetic failure"))
    assert(failures === Seq("q_broken_probe" -> "synthetic failure | second line"))
  }

  test("Tables.smokeCheck passes on the real fixtures and names drifted columns") {
    graft.sources.Tables.smokeCheck(spark, sf) // must not throw
    // drifted copy: region with r_name re-encoded to a number and the key
    // column renamed — the one failure must name both, table.column
    val dir = Files.createTempDirectory("graftdrift").toString
    for (t <- Seq("nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$dir/$t.parquet")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sf/region.parquet")
      .select(col("r_regionkey").as("r_key_renamed"), lit(1.0).as("r_name"))
      .write.parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException] {
      graft.sources.Tables.smokeCheck(spark, dir)
    }
    assert(e.getMessage.contains("region.r_regionkey: MISSING"))
    assert(e.getMessage.contains("region.r_name: frac (expected string)"))
    assert(e.getMessage.contains("region.r_key_renamed: unexpected column"))
  }

  test("events loader adapts to both physical ts encodings (long nanos / timestamp)") {
    import org.apache.spark.sql.types.TimestampType
    // current fixture (timestamp[us]) — loader must yield TimestampType
    val fromTs = graft.sources.Tables.events(spark, sf)
    assert(fromTs.schema("ts").dataType === TimestampType)
    // legacy encoding: write ts as long nanos and re-load through a copy
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graftnanos").toString
    fromTs.withColumn("ts",
        (unix_micros(col("ts")) * lit(1000L)).cast("long"))
      .write.parquet(s"$dir/events.parquet")
    val fromLong = graft.sources.Tables.events(spark, dir)
    assert(fromLong.schema("ts").dataType === TimestampType)
    // value parity: both paths agree row-for-row on the first events
    val a = fromTs.orderBy("event_id").limit(5).collect().map(_.toString).toSeq
    val b = fromLong.orderBy("event_id").limit(5).collect().map(_.toString).toSeq
    assert(a === b)
  }
}
