package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's single architectural idea (SURVEY.md §3 EP2): an
  * existence-gated parquet materialized-view cache (`file_exists` →
  * read-else-compute-and-write, Dataset.py:50-56 + 12 call sites), rebuilt
  * as a generic combinator. Native `FileSystem.exists` — no py4j gateway
  * hop — and correctness-neutral: callers always get the same DataFrame
  * semantics whether the memo hit or missed.
  *
  * Unlike the reference (and round-1's version), a bare path-exists probe is
  * NOT trusted: a failed or interrupted write leaves a partial directory
  * that would otherwise be served forever as if it were the result. The
  * cache is only valid when Hadoop's `_SUCCESS` commit marker is present;
  * writes go to a temp sibling and are published with an atomic rename, so
  * concurrent callers race safely (first rename wins, losers discard their
  * temp and read the winner's output).
  */
object Memo {
  def memoize(spark: SparkSession, path: String)(df: => DataFrame): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val valid = fs.exists(new Path(p, "_SUCCESS"))
    if (!valid) {
      if (fs.exists(p)) fs.delete(p, true) // partial/corrupt leftover
      val tmp = new Path(p.getParent,
        s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
      try {
        df.write.mode("overwrite").parquet(tmp.toString)
        // Publish atomically; a lost race means another writer already
        // committed an equivalent result — discard ours and read theirs.
        if (!fs.rename(tmp, p)) fs.delete(tmp, true)
      } catch {
        case e: Throwable => fs.delete(tmp, true); throw e
      }
    }
    spark.read.parquet(path)
  }

  /** Drop a memoized result (for refresh flows). */
  def invalidate(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }
}
