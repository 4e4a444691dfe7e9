package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: write `.explain("formatted")` output for selected queries to
  * files — the plan receipts committed under plans/rNN/ so a reviewer can
  * check Exchange counts / join strategies / PushedFilters claims without
  * running Spark. Usage:
  *   DevExplain <outDir> <suffix> <queryName>...
  * writes <outDir>/<qNN>_<suffix>.txt per query. Uses the bench's session
  * shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus) so the plans
  * match what the bench executes, not a dev-default 4-core shape.
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
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
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val prefix = name.takeWhile(_ != '_')
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${prefix}_$suffix.txt"),
        s"== $name ==\n$plan")
      println(s"wrote $prefix $suffix (${plan.length} chars)")
    }
    spark.stop()
    sys.exit(0)
  }
}
