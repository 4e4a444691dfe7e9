package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  test("streaming tumbling window equals the batch q22 result (parity)") {
    val batch = q("q22_window_tumbling").collect().map(_.toSeq).toSet
    val stream = q("q39_stream_tumbling").collect().map(_.toSeq).toSet
    assert(stream === batch)
  }

  test("watermark + append mode: windowed aggregation emits closed windows") {
    val events = graft.sources.Tables.events(spark, sf)
    val schema = events.schema
    val dir = java.nio.file.Files.createTempDirectory("graftstream").toString
    events.write.mode("overwrite").parquet(s"$dir/in")
    val agg = spark.readStream.schema(schema).parquet(s"$dir/in")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val qy = agg.writeStream.outputMode("append").format("memory")
      .queryName("wm_out").trigger(Trigger.AvailableNow()).start()
    qy.awaitTermination()
    // append mode withholds windows not yet past the watermark: strictly
    // fewer or equal groups than the complete-mode batch result
    val emitted = spark.table("wm_out").count()
    val total = q("q22_window_tumbling").count()
    assert(emitted > 0 && emitted <= total)
  }

  test("session windows: 30-minute-gap sessionization per user") {
    val sessions = graft.sources.Tables.events(spark, sf)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val n = sessions.count()
    assert(n > 0)
    // every session holds at least one event and spans >= 30 minutes
    val bad = sessions.filter(col("n_events") < 1 ||
      unix_timestamp(col("w.end")) - unix_timestamp(col("w.start")) < 1800)
    assert(bad.count() === 0)
  }
}
