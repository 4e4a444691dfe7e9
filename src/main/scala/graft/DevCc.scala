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
        if (dur > 1.0) println(f"[stage] id=${si.stageId} tasks=${si.numTasks} dur=$dur%.2fs ${si.name.take(60)}")
      }
    })
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devcc] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("q59_dup_clusters")(spark, sfDir).count()
    println(f"[devcc] q59: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    spark.stop()
  }
}
