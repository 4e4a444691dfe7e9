package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time the q59 edge-list materialization variants. */
object DevCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 0.3) println(f"[stage] id=${si.stageId} tasks=${si.numTasks} dur=$dur%.2fs ${si.name.take(60)}")
      }
    })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devcc] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), "\\s+")).as("tokset"))
    time("tokset_only") { docs.select(sum(size(col("tokset")))).head() }
    val withMh = docs.select(col("doc_id") +:
      (0 until 18).map(i => expr(s"array_min(transform(tokset, t -> cast(conv(substring(md5(concat('$i:', t)), 1, 8), 16, 10) as bigint)))").as(s"mh$i")): _*)
    time("minhash_proj") { withMh.select(sum(col("mh0") + col("mh17"))).head() }
    val vp = graft.operators.Dedup.verifiedPairs(spark, sfDir)
    val n = time("verified_pairs_full") { vp.count() }
    println(s"[devcc] pairs=$n")
    spark.stop()
  }
}
