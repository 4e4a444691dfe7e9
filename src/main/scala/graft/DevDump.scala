package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump ONLY the named queries (plus oracle_sql.json) in the
  * Verify layout, so tools/dev_compare.py can gate a new query in seconds
  * instead of re-running the whole suite. Not part of the driver contract.
  *
  * Usage: java ... graft.DevDump <sfDir> <outDir> <query> [query ...]
  */
object DevDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = names.map(n => n -> SparkEntry.queries(n))
    Verify.dumpAll(spark, sfDir, outDir, picked).foreach { case (n, e) =>
      println(s"[devdump] $n FAILED: $e")
    }
    val oracle = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      oracle.map { case (k, v) => s"${Verify.jstr(k)}: ${Verify.jstr(v)}" }
        .mkString("{", ", ", "}"))
    spark.stop()
  }
}
