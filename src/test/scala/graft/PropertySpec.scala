package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The algebraic laws SURVEY.md §5 commits to, as scalacheck properties
  * over small generated tables: operators must satisfy them on ANY input,
  * not just the fixtures. Each law runs the real operator shapes (groupBy,
  * filter, pivot, window) through the shared local session.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)

  private def check(p: Prop, tag: String): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$tag: $r")
  }

  private val rowsGen: Gen[List[(String, Int, Double)]] =
    Gen.listOfN(40, for {
      k <- Gen.oneOf("a", "b", "c")
      q <- Gen.choose(1, 12)
      v <- Gen.choose(0, 1000)
    } yield (k, q, v / 100.0))

  test("group-count is invariant under row order") {
    check(Prop.forAll(rowsGen) { rows =>
      val df1 = rows.toDF("k", "q", "v")
      val df2 = scala.util.Random.shuffle(rows).toDF("k", "q", "v")
      def counts(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      counts(df1) == counts(df2)
    }, "group-count row-order invariance")
  }

  test("filter on the group key commutes with grouping") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "q", "v")
      val filteredThenGrouped = df.filter(col("k") =!= "b")
        .groupBy("k").agg(sum("q").as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val groupedThenFiltered = df.groupBy("k").agg(sum("q").as("s"))
        .filter(col("k") =!= "b")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      filteredThenGrouped == groupedThenFiltered
    }, "filter/group commutation")
  }

  test("pivot row-sums equal the pre-pivot group counts") {
    val quarters = Seq("1", "2", "3", "4")
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "q", "v")
        .withColumn("quarter", (col("q") % 4 + 1).cast("string"))
      val pivoted = df.groupBy("k").pivot("quarter", quarters).count().na.fill(0)
      val rowSums = pivoted.collect()
        .map(r => r.getString(0) -> quarters.indices.map(i => r.getLong(i + 1)).sum)
        .toMap
      val groupCounts = df.groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      rowSums == groupCounts
    }, "pivot row-sum law")
  }

  test("trailing-frame moving average of a constant column is that constant") {
    check(Prop.forAll(Gen.choose(1, 50), Gen.choose(-5.0, 5.0)) { (n, c) =>
      val df = (1 to n).map(i => (i, c)).toDF("i", "v")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("i").rowsBetween(-2, 0)
      df.withColumn("ma", avg("v").over(w)).collect()
        .forall(r => math.abs(r.getDouble(2) - c) < 1e-12)
    }, "moving-average identity")
  }

  test("salted join result equals the plain join result") {
    val factGen = Gen.listOfN(30, for {
      k <- Gen.choose(1, 5); v <- Gen.choose(0, 100)
    } yield (k.toLong, v))
    check(Prop.forAll(factGen) { fact =>
      val left = fact.toDF("fk", "v")
      val dim = (1 to 5).map(i => (i.toLong, s"d$i")).toDF("pk", "name")
      val plain = left.join(dim, col("fk") === col("pk"))
        .select("fk", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
      val salted = graft.operators.Joins.saltedJoin(left, dim, "fk", "pk", salts = 4)
        .select("fk", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
      plain.toSeq == salted.toSeq
    }, "salted-join equivalence")
  }
}
