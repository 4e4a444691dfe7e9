package graft

import org.apache.spark.sql.functions._

class StorageSpec extends SparkSpec {

  test("compaction rewrites many small files into few, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graftcompact").toString
    val events = graft.sources.Tables.events(spark, sf)
    events.repartition(64).write.mode("overwrite").parquet(s"$dir/small")
    spark.read.parquet(s"$dir/small").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/compacted")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/small") === 64)
    assert(parquetFiles(s"$dir/compacted") === 4)
    assert(spark.read.parquet(s"$dir/compacted").count() === events.count())
  }

  test("mergeSchema read backfills the evolved column with nulls for old batches") {
    val out = q("q82_schema_evolution").collect()
    val n = out.map(_.getLong(1)).sum
    val withYear = out.map(_.getLong(2)).sum
    assert(n === graft.sources.Tables.orders(spark, sf).count())
    assert(withYear > 0 && withYear < n, "only the evolved batch has the column")
  }

  test("bucketed tables elide the sort too when files align one-per-bucket") {
    // the q66 write (8 buckets from a single-split source) yields one file
    // per bucket, so the merge join can also skip the per-partition Sort
    // on the already-sorted bucket files — assert the join executes and
    // matches the plain join's result
    val bucketed = q("q66_bucketed_join").collect().map(_.toSeq)
    val plain = q("q52_salted_join").collect().map(_.toSeq)
    assert(bucketed.toSeq === plain.toSeq)
  }
}
