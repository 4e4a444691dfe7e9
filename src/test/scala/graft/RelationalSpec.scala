package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("pivot row sums equal pre-pivot group counts (algebraic law)") {
    val pivoted = q("q13_pivot_quarters")
      .withColumn("row_total", col("Q1") + col("Q2") + col("Q3") + col("Q4"))
      .select("y", "row_total")
    val direct = graft.sources.Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).as("y")).count()
    val joined = pivoted.join(direct, "y")
      .filter(col("row_total") =!= col("count"))
    assert(joined.count() === 0)
  }

  test("NOT-IN via !isin drops nulls like SQL NOT IN (quirk pinned)") {
    val df = Seq(Some("a"), Some("b"), None).toDF("v")
    val kept = df.filter(!col("v").isin("a")).collect().map(_.getString(0))
    assert(kept.toSeq === Seq("b")) // null row filtered out, matching DuckDB
  }

  test("moving average over a constant series is the identity") {
    val df = (1 to 10).map(i => (i, 7L)).toDF("t", "cnt")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("t").rowsBetween(-2, 0)
    val bad = df.withColumn("mavg", avg("cnt").over(w))
      .filter(col("mavg") =!= 7.0)
    assert(bad.count() === 0)
  }

  test("dayofweek numbering: 1 = Sunday (2024-01-07 was a Sunday)") {
    val dow = Seq("2024-01-07").toDF("d")
      .select(dayofweek(to_timestamp(col("d"))).as("dow"))
      .head().getInt(0)
    assert(dow === 1)
  }

  test("to_timestamp parses the reference's 12-hour AM/PM pattern") {
    val ts = Seq("01/15/2019 03:30:00 PM").toDF("s")
      .select(to_timestamp(col("s"), "MM/dd/yyyy hh:mm:ss a").as("ts"))
      .head().getTimestamp(0)
    assert(ts.toString.startsWith("2019-01-15 15:30:00"))
  }

  test("boolean encode derives each column from itself (reference bug fixed)") {
    // Dataset.py:114 encodes Domestic from Arrest; ours must not.
    val df = Seq((true, false), (false, true)).toDF("arrest", "domestic")
      .withColumn("arrest_i", when(col("arrest"), 1).otherwise(0))
      .withColumn("domestic_i", when(col("domestic"), 1).otherwise(0))
    val rows = df.select("arrest_i", "domestic_i").as[(Int, Int)].collect().toSet
    assert(rows === Set((1, 0), (0, 1)))
  }

  test("flagship q01 returns the 6 flag/status groups with exact counts") {
    val rows = q("q01_pricing_summary").collect()
    assert(rows.length === 6)
    val expected = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum === expected)
  }

  test("q17 top-k per group yields at most 3 rows per returnflag") {
    val per = q("q17_topk_per_group").groupBy("l_returnflag").count().collect()
    assert(per.forall(_.getAs[Long]("count") <= 3))
  }

  test("approx_count_distinct (HLL++) lands within its rsd band of the exact count") {
    // the sketch path for cardinality at 100 TB, where exact distinct is a
    // full shuffle; no oracle (DuckDB's HLL differs) — banded instead
    val o = graft.sources.Tables.orders(spark, sf)
    val exact = o.select(countDistinct("o_custkey")).head().getLong(0)
    val approx = o.select(approx_count_distinct("o_custkey", rsd = 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"approx=$approx exact=$exact err=$err")
  }

  test("q64 window pack: ranks, quartiles and partition extremes are consistent") {
    val rows = q("q64_window_pack").collect()
    val byPriority = rows.groupBy(_.getString(1))
    byPriority.foreach { case (p, rs) =>
      assert(rs.map(_.getInt(2)).toSet === Set(1, 2, 3, 4), s"$p quartiles")
      assert(rs.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
      assert(rs.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
      // the whole-partition frame makes first/last constants per partition
      assert(rs.map(_.getLong(5)).toSet.size === 1, s"$p cheapest not constant")
      assert(rs.map(_.getLong(6)).toSet.size === 1, s"$p priciest not constant")
      // quartile boundaries respect the rank order: pct_rank 0 row is in q1
      val zero = rs.filter(_.getDouble(3) == 0.0)
      assert(zero.nonEmpty && zero.forall(_.getInt(2) === 1))
    }
  }

  test("q80 count-min sketch never underestimates (CMS guarantee)") {
    val rows = q("q80_countmin").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"key ${r.getLong(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}")
    }
  }

  test("q102 skew audit: summary is self-consistent and top-5 is sorted") {
    val rows = q("q102_skew_audit").collect()
    assert(rows.length === 5)
    val ns = rows.map(_.getLong(1))
    assert(ns.toSeq === ns.sorted.reverse.toSeq, "top-5 not sorted by n desc")
    rows.foreach { r =>
      val (n, nKeys, nRows, maxN, avgN, skew) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))
      assert(n <= maxN)
      assert(math.abs(avgN - nRows.toDouble / nKeys) < 1e-3)
      assert(math.abs(skew - maxN / avgN) < 1e-2)
    }
    // the heaviest key's multiplicity IS max_n
    assert(rows.head.getLong(1) === rows.head.getLong(4))
  }

  test("q100 interval join matches a brute-force range join") {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(997)) === 0)
      .select(col("o_orderkey").as("promo_id"),
        to_date(col("o_orderdate")).as("start_date"))
      .withColumn("end_date", date_add(col("start_date"), 6))
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(to_date(col("l_shipdate")).as("ship"))
    // brute force: no bucketing, raw range predicate (fixture-sized only)
    val expected = o.join(li,
        col("ship").between(col("start_date"), col("end_date")), "left")
      .groupBy("promo_id")
      .agg(count(col("ship")).as("n_lines"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = q("q100_interval_join").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === expected)
  }

  test("q79 fuzzy match: pairs are ordered, within-block, and within distance 2") {
    val rows = q("q79_fuzzy_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(4) <= 2)
    }
  }

  test("q76 gap fill: spine is contiguous and forward fill never leaves a null after the first value") {
    val rows = q("q76_gap_fill").collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    days.zip(days.tail).foreach { case (a, b) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) === 1L, s"gap $a→$b")
    }
    val firstFilled = rows.indexWhere(!_.isNullAt(3))
    assert(rows.drop(firstFilled).forall(!_.isNullAt(3)), "fill carries forward")
    // on observed days the fill equals the observation
    rows.filter(!_.isNullAt(2)).foreach(r => assert(r.getDouble(2) === r.getDouble(3)))
  }

  test("q77 histogram: 10 buckets, counts sum to row count, extremes non-empty") {
    val rows = q("q77_histogram").collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(rows.map(_._1).toSeq === (0 until 10))
    assert(rows.map(_._2).sum === graft.sources.Tables.orders(spark, sf).count())
    assert(rows.head._2 > 0 && rows.last._2 > 0, "min and max rows land in the edge buckets")
  }

  test("q78 trailing 7d window: frame sum matches a hand-rolled recompute") {
    val rows = q("q78_trailing_7d").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDouble(1), r.getDouble(2), r.getInt(3)))
    rows.foreach { case (day, _, rev7, present) =>
      val frame = rows.filter { case (d2, _, _, _) =>
        !d2.isAfter(day) && java.time.temporal.ChronoUnit.DAYS.between(d2, day) <= 6
      }
      assert(frame.length === present)
      assert(math.abs(BigDecimal(frame.map(_._2).sum).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble - rev7) < 0.02, s"$day")
    }
  }

  test("q62 cube: grouping sets are consistent (subtotals sum to the grand total)") {
    val rows = q("q62_cube").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    val grand = rows.collect { case (("ALL", "ALL", 3), n) => n }.sum
    val byStatus = rows.collect { case ((s, "ALL", 1), n) if s != "ALL" => n }.sum
    val byPriority = rows.collect { case (("ALL", p, 2), n) if p != "ALL" => n }.sum
    val cells = rows.collect { case ((s, p, 0), n) if s != "ALL" && p != "ALL" => n }.sum
    assert(Seq(byStatus, byPriority, cells).forall(_ === grand),
      s"grand=$grand status=$byStatus priority=$byPriority cells=$cells")
  }

  test("q161 grouping sets: exactly the requested sets — marginals + grand total, NO cross cells") {
    val rows = q("q161_grouping_sets").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    // gid 0 would be the (status, priority) cross — cube emits it,
    // grouping sets must not (it was not requested)
    assert(rows.keys.forall(_._3 != 0), s"unexpected cross cells: $rows")
    val grand = rows.collect { case (("ALL", "ALL", 3), n) => n }.sum
    val byStatus = rows.collect { case ((s, "ALL", 1), n) if s != "ALL" => n }.sum
    val byPriority = rows.collect { case (("ALL", p, 2), n) if p != "ALL" => n }.sum
    assert(grand > 0 && byStatus === grand && byPriority === grand,
      s"grand=$grand status=$byStatus priority=$byPriority")
  }
}
