package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's single architectural idea (SURVEY.md §3 EP2): an
  * existence-gated parquet materialized-view cache (`file_exists` →
  * read-else-compute-and-write, Dataset.py:50-56 + 12 call sites), rebuilt
  * as a generic combinator. Native `FileSystem.exists` — no py4j gateway
  * hop — and correctness-neutral: callers always get the same DataFrame
  * semantics whether the memo hit or missed.
  */
object Memo {
  def memoize(spark: SparkSession, path: String)(df: => DataFrame): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Drop a memoized result (for refresh flows). */
  def invalidate(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
