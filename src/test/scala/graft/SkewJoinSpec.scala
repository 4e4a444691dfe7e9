package graft

import graft.operators.Joins
import graft.sources.Tables
import org.apache.spark.sql.functions.{col, lit, when}

class SkewJoinSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
  private lazy val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")

  test("q165 FK audit: healthy star is all-zeros; one planted orphan flags exactly its edge") {
    val healthy = SparkEntry.queries("q165_fk_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(healthy.size === 7)
    assert(healthy.values.forall { case (n, o, k) => n > 0 && o == 0L && k == 0L },
      s"fixture must be referentially clean: $healthy")
    // replica with ONE lineitem pointed at a nonexistent supplier
    val dir = java.nio.file.Files.createTempDirectory("graftfk").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders"))
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val victim = li.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").head()
    li.withColumn("l_suppkey",
        when(col("l_orderkey") === victim.getLong(0) &&
          col("l_linenumber") === victim.getInt(1), lit(99999999L))
          .otherwise(col("l_suppkey")))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q165_fk_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got("lineitem->supplier") === ((1L, 1L)))
    assert((got - "lineitem->supplier").values.forall(_ == ((0L, 0L))),
      s"only the planted edge may flag: $got")
  }

  test("saltedJoin is row-for-row equivalent to the plain inner join") {
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
    val salted = Joins.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty, "salted produced extra rows")
    assert(plain.exceptAll(salted).isEmpty, "salted dropped rows")
  }

  test("saltedJoin keys the join on (key, salt) so a hot key spreads across reducers") {
    val p = Joins.saltedJoin(li, o, "l_orderkey", "o_orderkey", salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__lsalt"), p)
  }
}
