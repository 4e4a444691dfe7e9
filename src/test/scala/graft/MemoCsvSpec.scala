package graft

import graft.operators.Memo
import graft.sources.Csv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MemoCsvSpec extends SparkSpec {
  import spark.implicits._

  test("memoize computes once, then serves from parquet (reference S5)") {
    val dir = java.nio.file.Files.createTempDirectory("graftmemo").toString
    val path = s"$dir/memo.parquet"
    var computations = 0
    def expensive = { computations += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    val first = Memo.memoize(spark, path)(expensive)
    assert(first.count() === 2 && computations === 1)
    val second = Memo.memoize(spark, path)(expensive)
    assert(second.count() === 2 && computations === 1) // memo hit: not recomputed
    assert(Memo.invalidate(spark, path))
    Memo.memoize(spark, path)(expensive)
    assert(computations === 2)
  }

  test("memoize distrusts a partial cache dir (no _SUCCESS marker)") {
    val dir = java.nio.file.Files.createTempDirectory("graftmemo").toString
    val path = s"$dir/partial.parquet"
    // Simulate an interrupted write: data file present, no _SUCCESS commit
    // marker — round 1 served this silently; now it must recompute.
    Seq((1, "stale")).toDF("k", "v")
      .write.mode("overwrite").parquet(path)
    new java.io.File(s"$path/_SUCCESS").delete()
    var computations = 0
    def fresh = { computations += 1; Seq((1, "a"), (2, "b")).toDF("k", "v") }
    val out = Memo.memoize(spark, path)(fresh)
    assert(computations === 1)
    assert(out.count() === 2) // the fresh result, not the stale partial
  }

  test("q49 memo query path: warm call plans as a pure scan, no aggregate") {
    // First call computes q01 and publishes the cache; the warm call's plan
    // must be a parquet relation + sort — the aggregation never re-runs.
    val cold = q("q49_memo_pricing")
    val n = cold.count()
    val warm = q("q49_memo_pricing")
    assert(warm.count() === n)
    val plan = warm.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"), s"warm memo plan re-aggregates:\n$plan")
  }

  test("csv read with explicit schema (no inference pass)") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString
    Seq((1, "x", 2.5), (2, "y", 3.5)).toDF("id", "name", "score")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/t")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Csv.read(spark, s"$dir/t", schema)
    assert(df.schema === schema)
    assert(df.agg(sum("score")).head().getDouble(0) === 6.0)
  }

  test("crime-like schema covers the reference's 22 columns") {
    assert(Csv.crimeLikeSchema.fields.length === 22)
  }
}
