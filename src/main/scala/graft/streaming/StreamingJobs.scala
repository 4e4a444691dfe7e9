package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.{Q, QueryModule}
import graft.functions.Exact._
import org.apache.spark.sql.functions._

/** Structured Streaming slice (SURVEY.md §2.9 — absent from the reference;
  * reserved by the build plan M5). q39 runs the SAME tumbling-window
  * aggregate as the batch q22 through `readStream` → `writeStream`, so it
  * shares q22's DuckDB oracle: batch/stream parity is itself the check.
  *
  * Complete output mode + memory sink drive the static parquet as one
  * micro-batch; the production shape swaps the source for Kafka/files and
  * the sink for parquet/Delta, adds `withWatermark` + append mode (covered
  * in StreamingSpec along with session windows), and the state store
  * partitions by the grouping key exactly like the batch shuffle does.
  */
object StreamingJobs extends QueryModule {

  private val runId = new AtomicInteger()

  /** q39 — tumbling 1-hour event-time window over a streaming read of the
    * events table; result identical to the batch q22.
    */
  val streamTumbling: Q = (s, d) => {
    val path = s"$d/events.parquet"
    val schema = s.read.parquet(path).schema // ts arrives as long (nanos)
    // Stream the events file directly via a glob pattern — the round-2
    // `pathGlobFilter` over the whole sf dir re-listed every sibling table
    // on each micro-batch for nothing. The pattern must be a real glob:
    // FileStreamSource passes a non-glob path through as `basePath`, which
    // must be a directory (a bare file path throws in getBatch).
    val agg = s.readStream.schema(schema).parquet(s"$d/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
    val name = s"stream_tumbling_${runId.incrementAndGet()}"
    // AvailableNow drains the whole backlog in bounded micro-batches and
    // stops itself — the batch-parity trigger for a static input.
    val q = agg.writeStream.outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName(name).start()
    try q.awaitTermination()
    finally q.stop()
    // Materialize into a local DataFrame and drop the memory-sink view so
    // repeated runs in one session (bench loops, test reruns) don't
    // accumulate result copies in driver memory.
    val sink = s.table(name).orderBy("window_start", "event_type")
    val rows = java.util.Arrays.asList(sink.collect(): _*)
    val out = s.createDataFrame(rows, sink.schema)
    s.catalog.dropTempView(name)
    out
  }

  def queries: Map[String, Q] = Map("q39_stream_tumbling" -> streamTumbling)

  def oracles: Map[String, String] = Map(
    // identical semantics to q22 — same oracle
    "q39_stream_tumbling" ->
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)
}
