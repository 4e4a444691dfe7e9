package graft

import org.apache.spark.sql.functions._

/** Semantics of the sketch/graph/warehouse operators added in round 6:
  * q105 HLL distinct, q106 PageRank, q107 grid spatial join, q108
  * incremental aggregate merge, q109 SCD Type-2. Each is also on the
  * DuckDB oracle gate; these tests pin the properties the oracle can't
  * express (error bands, brute-force equivalence, interval invariants).
  */
class AnalyticsSpec extends SparkSpec {

  test("q105 HLL estimate lands within the m=64 error band of the exact count") {
    val r = q("q105_hll_distinct").collect()
    assert(r.length == 1)
    val (exact, empty, est) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(est > 0)
    // 1.04/sqrt(64) = 13% standard error; 35% is ~2.7 sigma — and the
    // query is deterministic, so this can never flake once green
    assert(math.abs(est - exact).toDouble / exact < 0.35, s"exact=$exact est=$est")
    assert(empty >= 0 && empty <= 64)
  }

  test("q118 grouped HLL: every group's corrected estimate within the m=64 error band") {
    val m = 64.0
    val rows = q("q118_grouped_hll").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, exact, empty, raw) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // the reader-side small-range correction the query's Scaladoc
      // documents: linear counting when the harmonic estimate is in the
      // biased range and empty registers remain
      val est = if (raw <= 2.5 * m && empty > 0) m * math.log(m / empty) else raw.toDouble
      assert(est > 0, s"group $g")
      // same 2.7-sigma band as q105's global sketch; deterministic query
      assert(math.abs(est - exact) / exact < 0.35,
        s"group $g exact=$exact raw=$raw corrected=$est")
    }
  }

  test("q115 bloom pre-filter: no false negatives, audited false positives") {
    val rows = q("q115_bloom_join").collect()
    assert(rows.nonEmpty)
    var passTot = 0L
    var matchTot = 0L
    rows.foreach { r =>
      val (n, pass, mtch, fp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // a Bloom filter can only over-approximate the member set
      assert(mtch <= pass, s"false negative: match=$mtch > pass=$pass")
      assert(fp == pass - mtch)
      assert(pass <= n)
      passTot += pass; matchTot += mtch
    }
    // the 65536-bit space over a few hundred keys must actually prune:
    // a degenerate all-pass filter would also satisfy the invariants
    val orders = q("q115_bloom_join").agg(sum("n_orders")).head().getLong(0)
    assert(passTot < orders, s"bloom passed everything ($passTot of $orders)")
    assert(matchTot > 0)
  }

  test("q122 rollup of daily HLL partials equals the direct monthly sketch") {
    import org.apache.spark.sql.functions._
    // direct monthly registers, skipping the daily stage entirely — the
    // merge≡recompute identity that makes the daily partial table the only
    // artifact worth storing
    val e = graft.sources.Tables.events(spark, sf).select(
      date_trunc("month", col("ts")).cast("date").as("month"),
      col("user_id").cast("string").as("k"))
    val direct = e.select(col("month"),
        pmod(conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long"), lit(64L))
          .as("bucket"),
        conv(substring(md5(col("k")), 9, 8), 16, 10).cast("long").as("w"))
      .withColumn("rho", when(col("w") === 0, lit(33))
        .otherwise(lit(33) - length(bin(col("w")))))
      .groupBy("month", "bucket").agg(max("rho").as("m"))
      .groupBy("month").agg(
        sum(pow(lit(2.0), lit(33) - col("m")).cast("long")).as("s_inv_nonempty"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rolled = q("q122_hll_rollup").collect()
    assert(rolled.nonEmpty)
    rolled.foreach { r =>
      val (month, empty, est) =
        (r.getDate(0).toString, r.getLong(3), r.getLong(4))
      // reconstruct the rollup's s_inv: empty registers contribute 2^33 each
      val sInv = direct(month) + empty * 8589934592L
      val expectEst = math.floor(0.709 * 4096.0 * 8589934592.0 / sInv).toLong
      assert(est === expectEst, s"month $month: rollup diverged from direct sketch")
    }
  }

  test("q125 snapshot diff classifies exactly by the snapshot membership rules") {
    val rows = q("q125_snapshot_diff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (key, op) = (r.getLong(0), r.getString(1))
      val (inV1, inV2) = (key % 13 != 0, key % 11 != 0)
      op match {
        case "insert" =>
          assert(!inV1 && inV2, s"key $key"); assert(r.isNullAt(2) && !r.isNullAt(3))
        case "delete" =>
          assert(inV1 && !inV2, s"key $key"); assert(!r.isNullAt(2) && r.isNullAt(3))
        case "update" =>
          assert(inV1 && inV2 && key % 7 == 0, s"key $key")
          assert(r.getDouble(3) > r.getDouble(2), s"key $key: reprice must raise")
        case other => fail(s"unexpected op $other")
      }
    }
    // every changed key must be present: spot-check the three classes exist
    val ops = rows.map(_.getString(1)).toSet
    assert(ops === Set("insert", "delete", "update"))
  }

  test("native hll_registers: register-identical to the Column formulation, partition-invariant") {
    import org.apache.spark.sql.functions._
    val keyed = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey").cast("string").as("k"))
    // the Column-level register bank q105 aggregates from
    val specRegs = {
      val got = keyed.select(
          pmod(conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long"), lit(64L))
            .as("bucket"),
          conv(substring(md5(col("k")), 9, 8), 16, 10).cast("long").as("w"))
        .withColumn("rho", when(col("w") === 0, lit(33))
          .otherwise(lit(33) - length(bin(col("w")))))
        .groupBy("bucket").agg(max("rho").as("m"))
        .collect().map(r => r.getLong(0).toInt -> r.getInt(1)).toMap
      Array.tabulate(64)(got.getOrElse(_, 0))
    }
    def native(parts: Int): Seq[Int] = keyed.repartition(parts)
      .agg(call_function("hll_registers", col("k"))).head().getSeq[Int](0)
    // merge must be partition-count-invariant (associativity of max), and
    // the buffer must equal the Column-level bank register for register
    assert(native(1) === specRegs.toSeq)
    assert(native(8) === specRegs.toSeq)
  }

  test("q119 CMS join-size estimate upper-bounds truth and carries signal") {
    val r = q("q119_join_cardinality").collect()
    assert(r.length == 1)
    val (nl, nr, truth, est) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // CMS inner product never under-counts (all cell products are sums of
    // non-negative collision terms over the true products)
    assert(est >= truth, s"inner-product estimate $est < true $truth")
    // width sizing must keep the additive n_A·n_B/w error from drowning
    // the signal: the estimate stays within truth + 2·(n_l·n_r/4096)
    assert(est <= truth + 2L * nl * nr / 4096,
      s"estimate $est too loose for truth $truth (n=$nl×$nr)")
    assert(truth > 0)
  }

  test("q106 PageRank: top-10 descending, floor rank respected, parts dominate") {
    val rows = q("q106_pagerank").collect()
    assert(rows.length == 10)
    val prs = rows.map(_.getLong(1))
    assert(prs.sameElements(prs.sortBy(-_)))
    // every node gets at least the teleport mass
    assert(prs.forall(_ >= 150000L))
    // part nodes aggregate many order links — the top node must be one
    assert(rows.head.getLong(0) > 10000000L)
  }

  test("q107 grid join equals the brute-force distance filter") {
    import spark.implicits._
    val got = q("q107_grid_join")
      .select("c_custkey", "s_suppkey", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"),
        (col("c_custkey") * 7919L % 1000L).as("x"),
        (col("c_custkey") * 104729L % 1000L).as("y"))
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey"),
        (col("s_suppkey") * 7577L % 1000L).as("sx"),
        (col("s_suppkey") * 99991L % 1000L).as("sy"))
    val brute = cust.crossJoin(supp)
      .withColumn("dist2",
        (col("x") - col("sx")) * (col("x") - col("sx"))
          + (col("y") - col("sy")) * (col("y") - col("sy")))
      .filter(col("dist2") <= 1600L)
      .select("c_custkey", "s_suppkey", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("q108 merged partial states equal the full recompute") {
    import spark.implicits._
    val got = q("q108_merge_agg")
      .select("l_returnflag", "l_linestatus", "n")
      .as[(String, String, Long)].collect()
      .map { case (f, st, n) => (f, st) -> n }.toMap
    val full = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
      .select("l_returnflag", "l_linestatus", "n")
      .as[(String, String, Long)].collect()
      .map { case (f, st, n) => (f, st) -> n }.toMap
    assert(got == full)
  }

  test("q110 quantile sketch estimates land within one bin width of the exact order statistics") {
    val r = q("q110_quantile_sketch").collect()
    assert(r.length == 1)
    val n = r(0).getLong(0)
    val (e50, e90, e99) = (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("percentile(l_extendedprice, array(0.5d, 0.9d, 0.99d)) as p")
      .collect()(0).getSeq[Double](0)
    val binWidth = 110000.0 / 256
    assert(n > 0)
    // the sketch reports the upper boundary of the quantile's bin, so the
    // exact value sits within one bin below it
    for ((est, ex) <- Seq(e50 -> exact(0), e90 -> exact(1), e99 -> exact(2))) {
      assert(ex <= est && ex > est - 2 * binWidth, s"est=$est exact=$ex")
    }
    assert(e50 <= e90 && e90 <= e99)
  }

  test("q132 rank sketch: rank-space error within the k=1024 sampling envelope") {
    val r = q("q132_rank_sketch").collect()
    assert(r.length == 1)
    val n = r(0).getLong(0)
    val (e50, e90, e99) = (r(0).getDouble(1), r(0).getDouble(2), r(0).getDouble(3))
    assert(n > 0)
    assert(e50 <= e90 && e90 <= e99)
    val vals = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice").as("v"))
    // realized rank of each estimate vs its target quantile: the whole
    // point of a RANK sketch — the guarantee is in rank space, with no
    // dependence on the value distribution (q110's bins bound value
    // error instead and need the domain up front)
    for ((est, qt, sigma) <- Seq(
        (e50, 0.5, 0.0157), (e90, 0.9, 0.0094), (e99, 0.99, 0.0032))) {
      val rank = vals.filter(col("v") <= est).count().toDouble / n
      // 5 sigma of the binomial envelope sqrt(q(1-q)/k); the hash draw is
      // deterministic, so once green this can never flake
      assert(math.abs(rank - qt) <= 5 * sigma,
        s"q=$qt est=$est realized rank=$rank")
    }
  }

  test("q133 grouped rank sketch: per-group rank error within the k=256 envelope") {
    val rows = q("q133_grouped_rank_sketch").collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("n_chars").cast("long").as("v"))
    rows.foreach { row =>
      val (lang, n) = (row.getString(0), row.getLong(1))
      val (e50, e90) = (row.getLong(2), row.getLong(3))
      assert(e50 <= e90, s"$lang p50 > p90")
      val group = docs.filter(col("lang") === lang)
      assert(group.count() === n)
      // a group smaller than k holds ALL its values, so resolution is 1/m
      val m = math.min(n, 256L).toDouble
      for ((est, qt) <- Seq(e50 -> 0.5, e90 -> 0.9)) {
        val rank = group.filter(col("v") <= est).count().toDouble / n
        val bound = math.max(5 * math.sqrt(qt * (1 - qt) / m), 2.0 / m)
        assert(math.abs(rank - qt) <= bound,
          s"$lang q=$qt est=$est realized rank=$rank bound=$bound")
      }
    }
  }

  test("q140 sketch threshold: every group keeps ~75%, within the sketch's rank envelope") {
    q("q140_sketch_threshold").collect().foreach { r =>
      val (lang, thr, n, kept) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(thr > 0 && kept > 0 && kept <= n)
      val frac = kept.toDouble / n
      // threshold = sketch p25 → keep fraction targets 0.75; the k=256
      // sample's rank error (5σ ≈ 0.135 at q=0.25) plus tie mass at the
      // threshold value bounds the deviation
      assert(math.abs(frac - 0.75) < 0.2, s"$lang kept fraction $frac")
    }
  }

  test("q137 native bottomk_sorted: sample-identical to the window form, partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    val rows = spark.read.parquet(s"$sf/documents.parquet").select(
      col("lang"), col("n_chars").cast("double").as("v"),
      md5(concat_ws("_", col("lang"), col("doc_id"))).as("hh"))
    val windowSamples = rows
      .withColumn("sn",
        row_number().over(Window.partitionBy("lang").orderBy("hh", "v")))
      .filter(col("sn") <= 256)
      .groupBy("lang").agg(sort_array(collect_list("v")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    def native(parts: Int) = rows.repartition(parts).groupBy("lang")
      .agg(call_function("bottomk_sorted", col("hh"), col("v"), lit(256)).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    // merge must be partition-count-invariant (the exact merge-identity
    // law), and the buffer must reproduce the window-form sample exactly
    assert(native(1) === windowSamples)
    assert(native(8) === windowSamples)
  }

  test("q132 bottom-k merge is exact: split-union-recompact equals the direct sketch") {
    import graft.operators.Stats
    val rows = spark.read.parquet(s"$sf/lineitem.parquet").select(
      col("l_extendedprice").as("v"),
      md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("hh"))
    val direct = Stats.bottomK(rows).collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSet
    // three disjoint "executor partials", each compacted to k rows, then
    // merged by recompacting the union — bottom-k is its own merge rule
    val parts = (0 until 3).map(i =>
      Stats.bottomK(rows.filter(pmod(crc32(col("hh")), lit(3)) === i)))
    val merged = Stats.bottomK(parts.reduce(_ unionByName _)).collect()
      .map(r => (r.getDouble(0), r.getString(1))).toSet
    assert(merged === direct, "merge of partials must equal the one-shot sketch")
    assert(direct.size === math.min(graft.operators.Stats.rkK,
      rows.count()).toInt)
  }

  test("q111 funnel stages are monotonically non-increasing") {
    val r = q("q111_funnel").collect()
    assert(r.length == 1)
    val (v, vc, full) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(v >= vc && vc >= full, s"$v $vc $full")
    assert(v > 0)
  }

  test("q150 Markov transitions: counts conserve the stream, row probabilities sum to ~1e6") {
    import spark.implicits._
    val rows = q("q150_markov_transitions")
      .as[(String, String, Long, Long)].collect()
    assert(rows.forall { case (_, _, n, p) => n > 0 && p > 0 && p <= 1000000L })
    // total transitions = total events minus one per active user (each
    // user's sequence of k events yields exactly k-1 adjacent pairs)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val users = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == ev.count() - users)
    // per-src ppm sums land within |dsts| of 1e6 (floor division loses
    // strictly less than 1 ppm per destination row)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val s = rs.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rs.length, s"src=$src sum=$s")
    }
  }

  test("q151 group trend recovers a planted perfect line exactly") {
    import spark.implicits._
    // monthly counts 3,5,7,... in consecutive months from Jan 1992 = the
    // line y = 2x + 3 with zero residual: the closed-form fit must return
    // it exactly (all moments integer-exact, one final divide)
    val rows = (0 until 6).flatMap { x =>
      val day = java.sql.Timestamp.valueOf(f"1992-${x + 1}%02d-15 00:00:00")
      Seq.fill(2 * x + 3)(("X", day))
    }
    val dir = java.nio.file.Files.createTempDirectory("grafttrend").toString
    rows.toDF("l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q151_group_trend")(spark, dir).head()
    assert(r.getAs[Long]("n_months") === 6L)
    assert(r.getAs[Long]("slope_ppm") === 2000000L)
    assert(r.getAs[Long]("intercept_ppm") === 3000000L)
  }

  test("q152 basket rules: planted co-occurrence yields exact support/confidence/lift") {
    import spark.implicits._
    // parts 10,20 co-occur in 3 of 4 baskets; every other pair occurs
    // once and falls under the support cut
    val items = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L), (4L, 30L), (4L, 40L))
    val dir = java.nio.file.Files.createTempDirectory("graftbasket").toString
    items.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q152_basket_rules")(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getAs[Long]("a"), r.getAs[Long]("b")) === (10L, 20L))
    assert(r.getAs[Long]("c_ab") === 3L)
    assert(r.getAs[Long]("conf_ab_ppm") === 1000000L) // 20 in every 10-basket
    assert(r.getAs[Long]("conf_ba_ppm") === 1000000L)
    assert(r.getAs[Long]("lift_ppm") === 1333333L)     // 3·4·1e6 // (3·3)
  }

  test("q154 seasonal backtest: planted year-over-year shift scores exactly") {
    import spark.implicits._
    // Jan-1992 ships 3, Jan-1993 ships 5: one eval month, |err| = 2,
    // bias = +2, APE = 2/5. A lone unmatched month (Mar-1993) must NOT
    // enter the eval set (explicit join, not a window lag).
    val rows =
      Seq.fill(3)(("X", java.sql.Timestamp.valueOf("1992-01-10 00:00:00"))) ++
      Seq.fill(5)(("X", java.sql.Timestamp.valueOf("1993-01-10 00:00:00"))) ++
      Seq.fill(4)(("X", java.sql.Timestamp.valueOf("1993-03-10 00:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graftseas").toString
    rows.toDF("l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q154_seasonal_backtest")(spark, dir).head()
    assert(r.getAs[Long]("n_eval") === 1L)
    assert(r.getAs[Long]("mae_ppm") === 2000000L)
    assert(r.getAs[Long]("bias") === 2L)
    assert(r.getAs[Long]("mape_ppm") === 400000L)
  }

  test("q156 HLL set algebra: union bank dominates, estimates land in the m=64 error band") {
    val r = q("q156_hll_set_algebra").head()
    val (exC, exP, exB) = (r.getAs[Long]("n_exact_click"),
      r.getAs[Long]("n_exact_purchase"), r.getAs[Long]("n_exact_both"))
    val (esC, esP, esU, esI) = (r.getAs[Long]("est_click"),
      r.getAs[Long]("est_purchase"), r.getAs[Long]("est_union"),
      r.getAs[Long]("est_intersect"))
    // register-wise max can only grow a bank: union >= each side, and
    // inclusion-exclusion keeps it <= the sum
    assert(esU >= math.max(esC, esP) && esU <= esC + esP)
    assert(esI == esC + esP - esU)
    // m=64 standard error is ~13%; 40% is a generous determinism-safe band
    def within(est: Long, exact: Long) =
      math.abs(est - exact).toDouble <= 0.4 * exact
    assert(within(esC, exC), s"click est=$esC exact=$exC")
    assert(within(esP, exP), s"purchase est=$esP exact=$exP")
    assert(exB <= math.min(exC, exP))
  }

  test("q160 equi-depth histogram: buckets partition the rows, ranges are disjoint ascending") {
    val rows = q("q160_equidepth_hist").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows.map(_._4).sum === n, "buckets must partition every row")
    assert(rows.forall { case (_, lo, hi, _) => lo <= hi })
    // ranges are disjoint and ascending with the bucket id
    assert(rows.sliding(2).forall { case Array((b1, _, h1, _), (b2, l2, _, _)) =>
      b1 < b2 && h1 < l2 })
    // depth balance: every bucket within one value-multiplicity of n/10
    val maxMult = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_quantity").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(rows.forall { case (_, _, _, c) => c <= n / 10 + maxMult },
      s"unbalanced: ${rows.mkString(",")} n/10=${n / 10} maxMult=$maxMult")
  }

  test("q164 TWAP: planted holds weight values by duration; the last value never counts") {
    import spark.implicits._
    // v=10 held 1s, v=20 held 3s, v=99 last (no hold): (10·1+20·3)/4 = 17.5
    val ns = 1000000000L
    val rows = Seq(
      (1L, 0L * ns, 7L, "purchase", 10.0, "{}"),
      (2L, 1L * ns, 7L, "purchase", 20.0, "{}"),
      (3L, 4L * ns, 7L, "purchase", 99.0, "{}"),
      (4L, 5L * ns, 7L, "view", 1000.0, "{}")) // non-purchase: ignored
    val dir = java.nio.file.Files.createTempDirectory("grafttwap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q164_twap")(spark, dir).head()
    assert(r.getAs[Long]("n_intervals") === 2L)
    assert(r.getAs[Long]("span_us") === 4000000L)
    assert(r.getAs[Long]("twap_ppm") === 17500000L)
  }

  test("q282 funnel: strict ordering and the 7-day window gate each step; hand-computed conversions and latencies") {
    import spark.implicits._
    val ns = 1000000000L
    val day = 86400L
    val rows = Seq(
      // user 1: the full funnel — view@0, click@+3600s, purchase@+7200s
      (1L, 0L * ns, 1L, "view", 0.0, "{}"),
      (2L, 3600L * ns, 1L, "click", 0.0, "{}"),
      (3L, 7200L * ns, 1L, "purchase", 0.0, "{}"),
      // user 2: purchase BEFORE the first view — must NOT convert
      (4L, 0L * ns, 2L, "purchase", 0.0, "{}"),
      (5L, 100L * ns, 2L, "view", 0.0, "{}"),
      // user 3: click 8 days after the view — outside the 7-day window
      (6L, 0L * ns, 3L, "view", 0.0, "{}"),
      (7L, 8 * day * ns, 3L, "click", 0.0, "{}"),
      // user 4: view→click in 100s, purchase 8 days after the click
      (8L, 0L * ns, 4L, "view", 0.0, "{}"),
      (9L, 100L * ns, 4L, "click", 0.0, "{}"),
      (10L, (100L + 8 * day) * ns, 4L, "purchase", 0.0, "{}"),
      // user 5: click with no view — never enters the funnel
      (11L, 0L * ns, 5L, "click", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftfunnel").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q282_funnel_steps")(spark, dir)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toList === List(
      (1, "view", 4L, 1000000L, -1L),
      // users 1 and 4 click in-window: conv 2/4, mean (3600+100)/2 s
      (2, "click", 2L, 500000L, 1850L * 1000000L),
      // only user 1 purchases in-window: conv 1/2, latency 3600 s
      (3, "purchase", 1L, 500000L, 3600L * 1000000L)))
  }

  test("q292 multi-touch: planted journeys yield hand-computed channel credit; every model's ledger sums to conversions exactly") {
    import spark.implicits._
    val ns = 1000000000L
    val day = 86400L
    val rows = Seq(
      // user 1: view → click → signup → purchase (n=3, first=view,
      // last=signup; linear 333334/333333/333333, U 400k/200k/400k)
      (1L, 0L * ns, 1L, "view", 0.0, "{}"),
      (2L, 100L * ns, 1L, "click", 0.0, "{}"),
      (3L, 200L * ns, 1L, "signup", 0.0, "{}"),
      (4L, 300L * ns, 1L, "purchase", 0.0, "{}"),
      // user 2: single click touch — every model gives click 100%
      (5L, 0L * ns, 2L, "click", 0.0, "{}"),
      (6L, 100L * ns, 2L, "purchase", 0.0, "{}"),
      // user 3: orphan purchase — "(none)" at full credit
      (7L, 0L * ns, 3L, "purchase", 0.0, "{}"),
      // user 4: two views (n=2 → 50/50, same channel → 100% view)
      (8L, 0L * ns, 4L, "view", 0.0, "{}"),
      (9L, 50L * ns, 4L, "view", 0.0, "{}"),
      (10L, 100L * ns, 4L, "purchase", 0.0, "{}"),
      // user 5: view 8 days before the purchase — outside the lookback
      (11L, 0L * ns, 5L, "view", 0.0, "{}"),
      (12L, 8 * day * ns, 5L, "purchase", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftmt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q292_multi_touch")(spark, dir)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toList === List(
      ("(none)", 2L, 2L, 2000000L, 2000000L, 2000000L, 2000000L),
      ("click", 2L, 2L, 1000000L, 1000000L, 1333333L, 1200000L),
      ("signup", 1L, 1L, 0L, 1000000L, 333333L, 400000L),
      ("view", 2L, 3L, 2000000L, 1000000L, 1333334L, 1400000L)),
      got.mkString(","))
    // the conservation law: 5 conversions × 1e6 per model, exactly
    Seq(3, 4, 5, 6).foreach { i =>
      assert(got.map(_.productElement(i).asInstanceOf[Long]).sum
        === 5000000L, s"model column $i leaks credit")
    }
  }

  test("q297 Shapley: planted journeys pin the three axioms — efficiency, symmetry, dummy player") {
    import spark.implicits._
    val ns = 1000000000L
    val rows = Seq(
      // user 1: view+click journey (mask 3)
      (1L, 0L * ns, 1L, "view", 0.0, "{}"),
      (2L, 100L * ns, 1L, "click", 0.0, "{}"),
      (3L, 200L * ns, 1L, "purchase", 0.0, "{}"),
      // user 2: view-only journey (mask 1)
      (4L, 0L * ns, 2L, "view", 0.0, "{}"),
      (5L, 100L * ns, 2L, "purchase", 0.0, "{}"),
      // user 3: click-only journey (mask 2); signup never touches
      (6L, 0L * ns, 3L, "click", 0.0, "{}"),
      (7L, 100L * ns, 3L, "purchase", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftshap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q297_shapley_attribution")(spark, dir)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // hand-computed: v(1)=v(2)=1, v(3)=v(7)=3; view/click symmetric at
    // 9 sixths each; signup the dummy at 0; 9+9+0 = 18 = 6·v(full)
    assert(got.toList === List(
      ("click", 1L, 3L, 9L, 500000L),
      ("signup", 0L, 3L, 0L, 0L),
      ("view", 1L, 3L, 9L, 500000L)), got.mkString(","))
  }

  test("q297 Shapley on the fixture: efficiency axiom exact, shares close the 1e6 ledger, every credit non-negative") {
    val got = q("q297_shapley_attribution").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(2)))
    val vFull = got.head._4
    assert(got.map(_._2).sum === 6L * vFull, "efficiency axiom broke")
    assert(got.map(_._3).sum === 1000000L, "share ledger leaks")
    got.foreach { case (ch, phi, sh, _) =>
      assert(phi >= 0L && sh >= 0L, s"$ch: $phi/$sh")
    }
  }

  test("q298 Markov attribution: planted chain yields hand-computed removal effects; dummy channel at zero") {
    import spark.implicits._
    val ns = 1000000000L
    val rows = Seq(
      // two view→purchase journeys, one click→purchase, one click→null:
      // p(start→view)=p(start→click)=0.5, p(view→purchase)=1,
      // p(click→purchase)=0.5 ⇒ v_base(start)=750000;
      // removing view ⇒ 250000 (RE 500000), click ⇒ 500000 (RE 250000)
      (1L, 0L * ns, 1L, "view", 0.0, "{}"),
      (2L, 100L * ns, 1L, "purchase", 0.0, "{}"),
      (3L, 0L * ns, 2L, "view", 0.0, "{}"),
      (4L, 100L * ns, 2L, "purchase", 0.0, "{}"),
      (5L, 0L * ns, 3L, "click", 0.0, "{}"),
      (6L, 100L * ns, 3L, "purchase", 0.0, "{}"),
      (7L, 0L * ns, 4L, "click", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftmkv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q298_markov_attribution")(spark, dir)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toList === List(
      ("click", 750000L, 500000L, 250000L, 333334L),
      ("signup", 750000L, 750000L, 0L, 0L),
      ("view", 750000L, 250000L, 500000L, 666666L)), got.mkString(","))
  }

  test("q298 Markov attribution on the fixture: removal effects non-negative, removed chains never convert more, ledger closes") {
    val got = q("q298_markov_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    got.foreach { case (ch, b, vr, re, _) =>
      assert(vr <= b, s"$ch: removal raised conversion probability")
      assert(re === b - vr && re >= 0L, ch)
    }
    if (got.map(_._4).sum > 0) assert(got.map(_._5).sum === 1000000L)
  }

  test("q300 Holt forecast: a planted linear ramp is tracked exactly — zero one-step error, horizon extrapolates the slope") {
    import spark.implicits._
    // cents = 100 + 10t: s0=100, b0=10, and the recurrence reproduces
    // the ramp with zero error at every step (hand-checkable: f_t = c_t
    // keeps s_t = c_t and b_t = 10 forever)
    val orders = (0 until 6).map { t =>
      (t.toLong, f"2020-${t + 1}%02d-01", (100L + 10 * t) / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftholt").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q300_holt_forecast")(spark, dir)
      .orderBy("m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val months = (0 until 6).map { t =>
      (t.toLong, 100L + 10 * t, 100L + 10 * t, 10L, 100L + 10 * t, 0L)
    }
    val horizon = (1 to 3).map { h =>
      (5L + h, -1L, 150L, 10L, 150L + 10 * h, 0L)
    }
    assert(got.toList === (months ++ horizon).toList, got.mkString(","))
  }

  test("q305 retention triangle: planted cohorts give the hand-computed rates, week-0 conserves the cohort, unobservable cells are -1") {
    import spark.implicits._
    val ns = 1000000000L
    val day = 86400L * ns
    // cohort week 0: users 1-4 purchase day 0; users 1,2 return day 7
    // (w1); user 1 returns day 14 (w2) — a nested no-return ladder, so
    // retention is monotone non-increasing by construction. User 5's
    // first purchase at day 21 opens cohort 3 and sets the global
    // horizon. User 6 is view-only — purchases define the cohort.
    val rows = Seq(
      (1L, 0L, 1L, "purchase", 1.0, "{}"),
      (2L, 0L, 2L, "purchase", 1.0, "{}"),
      (3L, 0L, 3L, "purchase", 1.0, "{}"),
      (4L, 0L, 4L, "purchase", 1.0, "{}"),
      (5L, 7L * day, 1L, "purchase", 1.0, "{}"),
      (6L, 7L * day, 2L, "purchase", 1.0, "{}"),
      (7L, 14L * day, 1L, "purchase", 1.0, "{}"),
      (8L, 21L * day, 5L, "purchase", 1.0, "{}"),
      (9L, 0L, 6L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftret").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q305_retention_triangle")(spark, dir)
      .orderBy("cohort_wk").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (2 to 10).map(r.getLong).toList))
    assert(got.toList === List(
      (0L, 4L, List(1000000L, 500000L, 250000L, 0L, -1L, -1L, -1L, -1L, -1L)),
      (3L, 1L, List(1000000L, -1L, -1L, -1L, -1L, -1L, -1L, -1L, -1L))),
      got.mkString(","))
    // the planted ladder never re-acquires: observable cells are
    // monotone non-increasing
    got.foreach { case (_, _, cells) =>
      val obs = cells.takeWhile(_ >= 0)
      assert(obs === obs.sorted.reverse, cells.toString)
    }
  }

  test("q305 retention triangle on the fixture: week-0 conservation, cells in [0, 1e6], horizon cut exact") {
    val rows = q("q305_retention_triangle").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (2 to 10).map(r.getLong).toList))
    assert(rows.nonEmpty)
    rows.foreach { case (wk, n, cells) =>
      assert(n > 0)
      assert(cells.head === 1000000L,
        s"cohort $wk: first purchase IS week-0 activity")
      // sentinels are a SUFFIX (horizon is a single cut, never a hole)
      val (obs, sent) = cells.span(_ >= 0L)
      assert(sent.forall(_ === -1L), cells.toString)
      obs.foreach(c => assert(c <= 1000000L, s"cohort $wk: $c"))
    }
    // the horizon is GLOBAL: every row's first sentinel offset lands at
    // the same absolute week mx+1
    val cuts = rows.flatMap { case (wk, _, cells) =>
      val k = cells.indexWhere(_ === -1L)
      if (k >= 0) Some(wk + k) else None
    }
    assert(cuts.distinct.size <= 1, cuts.toString)
  }

  test("q303 Holt-Winters: a planted seasonal ramp is tracked exactly while linear Holt (q300) misses by the seasonal term") {
    import spark.implicits._
    // cents = A + B·t + S[t mod 12], ΣS = 0, B even: the two-season init
    // is then division-exact (s2−s1 = B·144; s1 div 12 = A + B·11/2) and
    // recovers the TRUE components (l0 = A + 11B, b0 = B, seas = S), so
    // every one-step forecast from t = 12 on equals the actual exactly —
    // the hand-checkable law the operator's init convention exists for
    val S = Vector(600L, -600L, 300L, -300L, 120L, -120L,
      60L, -60L, 24L, -24L, 0L, 0L)
    val A = 1000000L; val B = 2L
    val orders = (0 until 30).map { t =>
      val cents = A + B * t + S(t % 12)
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", cents / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("grafthw").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q303_holt_winters")(spark, dir)
      .orderBy("m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val want = (12 until 30).map { t =>
      (t.toLong, A + B * t + S(t % 12), A + B * t, B, S(t % 12),
        A + B * t + S(t % 12), 0L)
    } ++ (1 to 3).map { h =>
      ((29 + h).toLong, -1L, A + B * 29, B, S((29 + h) % 12),
        A + B * (29 + h) + S((29 + h) % 12), 0L)
    }
    assert(got.toList === want.toList, got.mkString(","))
    // the same series under q300's LINEAR Holt: the unmodeled seasonal
    // term leaves systematic one-step error — the contrast that makes
    // the seasonal component worth its three extra state slots
    val holtErr = SparkEntry.queries("q300_holt_forecast")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("abs_err_cents"))
      .head().getLong(0)
    assert(holtErr > 0L, "linear Holt should miss the seasonal term")
    // under two full seasons the fit is undefined — loud, not silent
    val shortDir = java.nio.file.Files.createTempDirectory("grafthws").toString
    orders.limit(6).write.mode("overwrite").parquet(s"$shortDir/orders.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q303_holt_winters")(spark, shortDir).collect()
    }
    assert(e.getMessage.contains("q303"))
    // q306 backtest on the same planted series: Holt-Winters wins with
    // EXACTLY zero out-of-fit error; seasonal-naive misses by the trend
    // (|c_t − c_{t−12}| = 12B = 24 every month); linear Holt misses by
    // the unmodeled seasonal; the q319 AR panel member scores too (its
    // trend+seasonal residuals can't reach zero) and never flags best
    val bt = SparkEntry.queries("q306_forecast_backtest")(spark, dir)
      .orderBy("model").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(bt.map(_._1).toList ===
      List("ar", "arma", "holt", "holt_winters", "ma",
        "seasonal_naive"),
      bt.mkString(","))
    val Array(ar, arma, holt, hw, ma, naive) = bt
    assert(arma._2 === 6L && arma._3 > 0L && !arma._5, bt.mkString(","))
    assert(hw === ("holt_winters", 6L, 0L, 0L, true), bt.mkString(","))
    assert(naive === ("seasonal_naive", 6L, 144L, 24L, false), bt.mkString(","))
    assert(holt._1 === "holt" && holt._2 === 6L && holt._3 > 0L && !holt._5,
      bt.mkString(","))
    assert(ar._2 === 6L && ar._3 > 0L && !ar._5, bt.mkString(","))
    // the q351 MA member scores too — a moving average cannot model a
    // trend+seasonal series, so it never flags best here
    assert(ma._2 === 6L && ma._3 > 0L && !ma._5, bt.mkString(","))
  }

  test("q301 RFM: cells partition the customer base, quintiles deal evenly, and the segment mapping is consistent") {
    val rows = q("q301_rfm_segments").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4)))
    val nCust = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._5).sum === nCust, "cells must partition customers")
    // ntile deals |bucket sizes| within 1 of each other per dimension
    Seq(rows.groupBy(_._1), rows.groupBy(_._2), rows.groupBy(_._3))
      .foreach { dim =>
        val sizes = dim.view.mapValues(_.map(_._5).sum).values.toSeq
        assert(sizes.max - sizes.min <= 1, sizes.toString)
        assert(dim.keySet.subsetOf((1 to 5).toSet))
      }
    // the mapping is a pure function of the scores
    rows.foreach { case (r, f, m, seg, _) =>
      val want =
        if (r >= 4 && f >= 4 && m >= 4) "champions"
        else if (r >= 4 && f <= 2) "new"
        else if (r <= 2 && f >= 4) "at_risk_loyal"
        else if (r <= 2 && f <= 2) "hibernating"
        else "core"
      assert(seg === want, s"($r,$f,$m)")
    }
  }

  test("q302 association rules: planted baskets yield hand-computed support, confidence, and lift") {
    import spark.implicits._
    // baskets: {1,2}×3, {1}, {2}, {3} — pair (1,2): co 3, support 3/6,
    // conf 3/4 both ways, lift 3·6/(4·4) = 1.125
    val li = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (5L, 2L), (6L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graftrules").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q302_assoc_rules")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    assert(got.toList === List(
      (1L, 2L, 3L, 4L, 4L, 500000L, 750000L, 750000L, 1125000L)),
      got.mkString(","))
  }

  test("q304 Apriori triples: planted baskets yield the hand-computed triple support, confidences, and pair-floor lifts") {
    import spark.implicits._
    // brands per basket: {X,Y,Z}×3, {X,Y}, {Z}, {W} — nb=6; item counts
    // X=4 Y=4 Z=4 W=1; frequent pairs (X,Y)=4 (X,Z)=3 (Y,Z)=3; the one
    // surviving triple (X,Y,Z) co3=3: support 3/6, conf XY→Z = 3/4,
    // XZ→Y = YZ→X = 1, lift XY→Z = 3·6/(4·4) = 1.125, the other two
    // 3·6/(3·4) = 1.5
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L), (4L, 1L), (4L, 2L), (5L, 3L),
      (6L, 4L)).toDF("l_orderkey", "l_partkey")
    val part = Seq((1L, "BX"), (2L, "BY"), (3L, "BZ"), (4L, "BW"))
      .toDF("p_partkey", "p_brand")
    val dir = java.nio.file.Files.createTempDirectory("grafttriples").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    part.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q304_assoc_triples")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
        r.getLong(11), r.getLong(12), r.getLong(13)))
    assert(got.toList === List(
      ("BX", "BY", "BZ", 3L, 4L, 3L, 3L, 500000L,
        750000L, 1000000L, 1000000L, 1125000L, 1500000L, 1500000L)),
      got.mkString(","))
  }

  test("q283 conformal: query output equals a driver-side split-conformal replica; coverage sits in the 90%-target band") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(k: Long): Long =
      java.lang.Long.parseLong(md5hex(k.toString).substring(0, 8), 16) % 100
    val seg = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), seg(r.getLong(1)), r.getLong(2)))
    val expected = rows.map(_._2).distinct.sorted.map { sg =>
      val mine = rows.filter(_._2 == sg)
      val train = mine.filter(t => bucket(t._1) < 50)
      val yhat = train.map(t => BigInt(t._3)).sum / train.length
      val cal = mine.filter(t => { val b = bucket(t._1); b >= 50 && b < 80 })
        .map(t => math.abs(t._3 - yhat.toLong)).sorted
      val k = ((cal.length + 1) * 9 + 9) / 10 // ceil((n+1)*0.9)
      val qhat = if (k <= cal.length) cal(k - 1) else Long.MaxValue
      val test = mine.filter(t => bucket(t._1) >= 80)
      val covered = test.count(t => math.abs(t._3 - yhat.toLong) <= qhat)
      (sg, train.length.toLong, cal.length.toLong, test.length.toLong,
        yhat.toLong, qhat, covered.toLong * 1000000L / test.length)
    }
    val got = q("q283_conformal_coverage").orderBy("seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toList === expected.toList)
    // the distribution-free guarantee: coverage ~ 90% in expectation;
    // the fixture folds are a few hundred rows per segment, so allow the
    // finite-sample spread (deterministic — can never flake once green)
    got.foreach { case (sg, _, _, nTest, _, _, cov) =>
      assert(cov >= 800000L && cov <= 990000L, s"$sg: $cov ppm over $nTest")
    }
  }

  test("q283 conformal: a calibration-empty segment surfaces with the infinite-interval sentinel, not dropped") {
    // planted fixture: segment E's keys all fall in the train/test
    // buckets (none in 50–79), so its calibration fold is EMPTY — the
    // conformal-defined answer is the infinite interval (qhat =
    // Long.MaxValue, coverage 100%), and the advisor-found bug dropped
    // the segment from the output instead
    import spark.implicits._
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(k: Long): Long =
      java.lang.Long.parseLong(md5hex(k.toString).substring(0, 8), 16) % 100
    val keys = (1L to 4000L)
    val eTrain = keys.filter(bucket(_) < 50).take(20)
    val eTest = keys.filter(bucket(_) >= 80).take(10)
    val aKeys = keys.filterNot(k => eTrain.contains(k) || eTest.contains(k))
      .take(300)
    val orders = (eTrain.map((_, 1L, 100.00)) ++ eTest.map((_, 1L, 100.00)) ++
      aKeys.map((_, 2L, 50.00)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
    val cust = Seq((1L, "E"), (2L, "A")).toDF("c_custkey", "c_mktsegment")
    val dir = java.nio.file.Files.createTempDirectory("graftconf").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = SparkEntry.queries("q283_conformal_coverage")(spark, dir)
      .orderBy("seg").collect()
    val e = got.find(_.getString(0) == "E")
      .getOrElse(fail("calibration-empty segment E missing from output"))
    assert(e.getAs[Long]("n_train") === 20L)
    assert(e.getAs[Long]("n_cal") === 0L)
    assert(e.getAs[Long]("n_test") === 10L)
    assert(e.getAs[Long]("qhat_cents") === Long.MaxValue)
    assert(e.getAs[Long]("coverage_ppm") === 1000000L,
      "the infinite interval covers every test row by definition")
  }

  test("q288 concentration: query equals a driver-side exact Gini/top-share replica") {
    val sums = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("v"))
      .collect().map(_.getLong(1)).sorted
    val n = sums.length.toLong
    val t = sums.map(BigInt(_)).sum
    val sWeighted = sums.zipWithIndex
      .map { case (v, i) => BigInt(v) * (i + 1) }.sum
    val gini = (2 * sWeighted - (n + 1) * t) * 1000000 / (n * t)
    def share(pct: Int): (Long, Long) = {
      val k = ((n * pct + 99) / 100).toInt
      val top = sums.takeRight(k).map(BigInt(_)).sum
      (k.toLong, (top * 1000000 / t).toLong)
    }
    val (k1, s1) = share(1)
    val (k10, s10) = share(10)
    val r = q("q288_concentration").head()
    assert(r.getAs[Long]("n_customers") === n)
    assert(r.getAs[Long]("total_cents") === t.toLong)
    assert(r.getAs[Long]("gini_ppm") === gini.toLong)
    assert(r.getAs[Long]("top1pct_n") === k1)
    assert(r.getAs[Long]("top1pct_share_ppm") === s1)
    assert(r.getAs[Long]("top10pct_n") === k10)
    assert(r.getAs[Long]("top10pct_share_ppm") === s10)
    // sanity: shares nest and Gini is a genuine inequality signal
    assert(s10 >= s1 && s1 * 10 >= 100000,
      s"top1=$s1 top10=$s10 gini=${gini.toLong}")
  }

  test("q168 interval coverage: overlapping holds merge, the gap opens a second island") {
    import spark.implicits._
    // holds are 1800s: events at 0s and 600s overlap into one island
    // [0, 2400s]; the event at 10000s opens a second island [10000, 11800]
    // → 2 islands, 2400 + 1800 = 4200s covered.
    val ns = 1000000000L
    val rows = Seq(
      (1L, 0L * ns, 7L, "view", 0.0, "{}"),
      (2L, 600L * ns, 7L, "click", 0.0, "{}"),
      (3L, 10000L * ns, 7L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftcov").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q168_interval_coverage")(spark, dir).head()
    assert(r.getAs[Long]("n_islands") === 2L)
    assert(r.getAs[Long]("covered_us") === 4200L * 1000000L)
  }

  test("q169 A/B chi-square: cells partition the users, statistic recomputes from the cells") {
    val r = q("q169_ab_chisq").head()
    val (n, na, nb, ca, cb, chi) = (r.getAs[Long]("n_users"),
      r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("conv_a"), r.getAs[Long]("conv_b"),
      r.getAs[Long]("chi2_micro"))
    assert(na + nb === n && na > 0 && nb > 0)
    assert(ca <= na && cb <= nb)
    // recompute the closed form in BigInt from the published cells
    val (a, b, c, d) = (BigInt(ca), BigInt(na - ca), BigInt(cb), BigInt(nb - cb))
    val det = a * d - b * c
    val denom = (a + b) * (c + d) * (a + c) * (b + d)
    val want =
      if (denom == 0) BigInt(0)
      else (BigInt(n) * det * det * 1000000) / denom
    assert(BigInt(chi) === want, s"chi2_micro=$chi want=$want")
    assert(r.getAs[Boolean]("significant") === (chi > 3841459L))
  }

  test("q173 ROC sweep: confusion rows partition the population at every threshold, recall hits 1e6 at the floor") {
    val rows = q("q173_roc_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val n = rows.head match { case (_, tp, fp, fn, tn, _, _) => tp + fp + fn + tn }
    rows.foreach { case (_, tp, fp, fn, tn, prec, rec) =>
      assert(tp + fp + fn + tn === n)
      assert(prec >= 0 && prec <= 1000000 && rec >= 0 && rec <= 1000000)
    }
    // thresholds ascend; tp (>= t) is non-increasing in t
    assert(rows.sliding(2).forall { case Array(a, b) => a._1 < b._1 && a._2 >= b._2 })
    // the lowest observed threshold captures every positive
    assert(rows.head._7 === 1000000L)
  }

  test("q174 exact AUC: planted score distribution gives the hand-computed Mann-Whitney value") {
    import spark.implicits._
    // pos scores {2,3}, neg scores {1,2}: concordant 3, tied 1 of the 4
    // pairs → AUC = 3.5/4 = 0.875
    val ns = 1000000000L
    def views(uid: Long, k: Int, base: Long) = (0 until k).map(i =>
      (base + i, (i + 1) * ns, uid, "view", 0.0, "{}"))
    val rows = views(1L, 2, 100) ++ views(2L, 3, 200) ++
      views(3L, 1, 300) ++ views(4L, 2, 400) ++
      Seq((500L, 50L * ns, 1L, "purchase", 1.0, "{}"),
        (501L, 51L * ns, 2L, "purchase", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftauc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q174_auc_exact")(spark, dir).head()
    assert(r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Long]("auc_micro") === 875000L)
  }

  test("q175 OHLC bars: planted ticks give exact open/close by time, high/low by value") {
    import spark.implicits._
    // one day, ticks at 1s/2s/3s with values 5, 9, 2 → open 5e6, high
    // 9e6, low 2e6, close 2e6, volume 16e6; a second day with one tick.
    val ns = 1000000000L
    val day2 = 86400L * ns
    val rows = Seq(
      (1L, 1L * ns, 7L, "purchase", 5.0, "{}"),
      (2L, 2L * ns, 7L, "purchase", 9.0, "{}"),
      (3L, 3L * ns, 8L, "purchase", 2.0, "{}"),
      (4L, day2 + ns, 7L, "purchase", 4.0, "{}"),
      (5L, 10L * ns, 7L, "view", 777.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftohlc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q175_ohlc_bars")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toList === List(
      ("1970-01-01", 5000000L, 9000000L, 2000000L, 2000000L, 3L, 16000000L),
      ("1970-01-02", 4000000L, 4000000L, 4000000L, 4000000L, 1L, 4000000L)))
  }

  test("q112 cohort retention: offset-0 rows cover every user exactly once") {
    import spark.implicits._
    val rows = q("q112_cohort_retention")
      .select(col("cohort_day").cast("string"), col("day_offset"), col("n_users"))
      .as[(String, Int, Long)].collect()
    assert(rows.forall(_._2 >= 0))
    assert(rows.forall(_._3 > 0))
    val day0 = rows.filter(_._2 == 0).map(_._3).sum
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    // every user appears in their own cohort's day-0 cell, never elsewhere
    assert(day0 == users, s"day0=$day0 users=$users")
    // retention can never exceed the cohort's size
    val cohortSize = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(rows.forall(r => r._3 <= cohortSize(r._1)))
  }

  test("q109 SCD2 intervals: consecutive versions, one current row, no gaps") {
    import spark.implicits._
    val rows = q("q109_scd2")
      .select(col("o_custkey"), col("version"), col("status"),
        col("valid_from").cast("string"), col("valid_to").cast("string"),
        col("is_current"))
      .as[(Long, Int, String, String, Option[String], Int)].collect()
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..n with no holes
      assert(sorted.map(_._2).sameElements(1 to sorted.length), s"cust $k")
      // exactly one open (current) interval, and it is the last version
      assert(sorted.count(_._5.isEmpty) == 1 && sorted.last._5.isEmpty, s"cust $k")
      assert(sorted.count(_._6 == 1) == 1 && sorted.last._6 == 1, s"cust $k")
      // each interval closes exactly where the next opens; status changes
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"cust $k gap/overlap")
          assert(a._3 != b._3, s"cust $k no-op version")
        case _ =>
      }
    }
  }

  test("q179 PSI: mirrored halves give zero drift in every bin; one-sided shift gives positive total") {
    import spark.implicits._
    def write(dir: String, rows: Seq[(Long, Double, String)]): Unit =
      rows.zipWithIndex.map { case ((ck, price, day), i) =>
        (i.toLong, ck, "O", price,
          java.sql.Timestamp.valueOf(s"$day 00:00:00"), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // span 1995-01-01..1995-01-10, mid = day 5 (datediff 9 div 2 = 4):
    // identical price multisets {1, 5, 9} land on day 1 (base) and day 10
    // (curr) → every bin has n_base = n_curr and tb = tc → PSI ≡ 0
    val dir = java.nio.file.Files.createTempDirectory("graftpsi").toString
    write(dir, Seq(
      (1L, 1.0, "1995-01-01"), (2L, 5.0, "1995-01-01"), (3L, 9.0, "1995-01-01"),
      (4L, 1.0, "1995-01-10"), (5L, 5.0, "1995-01-10"), (6L, 9.0, "1995-01-10")))
    val zero = SparkEntry.queries("q179_psi_drift")(spark, dir).collect()
    assert(zero.forall(_.getAs[Long]("psi_micro") === 0L),
      zero.mkString(","))
    assert(zero.map(r => r.getAs[Long]("n_base")).sum === 3L)
    assert(zero.map(r => r.getAs[Long]("n_curr")).sum === 3L)
    // prices shift wholesale 1.0 → 9.0 across the midpoint → positive PSI
    val dir2 = java.nio.file.Files.createTempDirectory("graftpsi2").toString
    write(dir2, Seq(
      (1L, 1.0, "1995-01-01"), (2L, 1.0, "1995-01-02"), (3L, 1.0, "1995-01-03"),
      (4L, 9.0, "1995-01-08"), (5L, 9.0, "1995-01-09"), (6L, 9.0, "1995-01-10")))
    val drift = SparkEntry.queries("q179_psi_drift")(spark, dir2).collect()
    assert(drift.map(_.getAs[Long]("psi_micro")).sum > 1000000L,
      drift.mkString(","))
  }

  test("q196 lateness audit: two-phase prefix max carries across the 1024 bucket boundary; thresholds are strict") {
    import spark.implicits._
    val sNs = 1000000000L
    // arrival order = event_id; ts in seconds. id 7 is late by exactly
    // 900s (strictly-greater thresholds: counts at 1m/5m, NOT at 15m);
    // id 1024 sits in bucket 1 and is late ONLY via bucket 0's prefix
    // max (id 1023's 5000s) — the cross-bucket carry this test pins.
    val rows = Seq(
      (0L, 0L), (5L, 1000L * sNs), (7L, 100L * sNs),
      (1023L, 5000L * sNs), (1024L, 0L), (2000L, 6000L * sNs))
    val dir = java.nio.file.Files.createTempDirectory("graftlate").toString
    rows.map { case (id, ts) => (id, ts, 1L, "view", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q196_lateness_audit")(spark, dir).head()
    assert(r.getAs[Long]("n_events") === 6L, r.toString)
    assert(r.getAs[Long]("n_late_1m") === 2L, r.toString)   // 900s, 5000s
    assert(r.getAs[Long]("n_late_5m") === 2L, r.toString)
    assert(r.getAs[Long]("n_late_15m") === 1L, r.toString)  // 900s excluded
    assert(r.getAs[Long]("max_late_us") === 5000L * 1000000L, r.toString)
  }

  test("q193 skyline: weak dominance prunes date-ties at lower prices; duplicates survive with multiplicity") {
    import spark.implicits._
    def o(k: Long, price: Double, day: String) =
      (k, k, "O", price, java.sql.Timestamp.valueOf(s"$day 00:00:00"),
        "1-URGENT")
    val rows = Seq(
      o(1, 10.0, "1995-01-05"), // frontier: highest price
      o(2, 9.0, "1995-01-06"),  // frontier: newer than everything pricier
      o(3, 8.0, "1995-01-06"),  // dominated by #2 (≥ both, > price)
      o(4, 8.0, "1995-01-04"),  // dominated by #2 outright
      o(5, 7.0, "1995-01-07"),  // frontier: newest overall
      o(6, 7.0, "1995-01-07"))  // exact duplicate of #5 — multiplicity 2
    val dir = java.nio.file.Files.createTempDirectory("graftsky").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q193_skyline")(spark, dir).collect()
      .map(r => (r.getAs[Long]("pq"), r.getAs[java.sql.Date]("dt").toString,
        r.getAs[Long]("n_orders")))
    assert(got.toList === List(
      (1000L, "1995-01-05", 1L), (900L, "1995-01-06", 1L),
      (700L, "1995-01-07", 2L)), got.mkString(","))
  }

  test("q194 salt advisor: the hot key gets ceil(n/target) replicas, cold keys get exactly 1") {
    import spark.implicits._
    // 640 rows for key 1 (20× the per-task target of 32), 1 row each for
    // keys 2..321 → total 960, target = 960 div 32 = 30, salt(1) = 22
    val rows = (1 to 640).map(_ => 1L) ++ (2L to 321L)
    val dir = java.nio.file.Files.createTempDirectory("graftsalt").toString
    rows.map(k => (1L, 1L, k, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Date.valueOf("1995-01-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q194_salt_advisor")(spark, dir).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("n"),
        r.getAs[Long]("salt_factor")))
    assert(got.head === ((1L, 640L, 22L)), got.mkString(","))
    assert(got.tail.forall { case (_, n, sf2) => n === 1L && sf2 === 1L },
      got.mkString(","))
  }

  test("q195 CUSUM: the changepoint lands on the last day before a planted mean shift") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // days 1..4 at value 1.00, days 5..8 at 9.00 → |S_k| peaks at day 4
    val rows = (1 to 8).map { day =>
      (day.toLong, day * dayNs, 7L, "view",
        if (day <= 4) 1.0 else 9.0, "{}")
    }
    val dir = java.nio.file.Files.createTempDirectory("graftcusum").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q195_cusum_changepoint")(spark, dir).head()
    assert(r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay === 4L,
      r.toString)
    // S_4 = 4·100 − (4/8)·4000 = −1600 cents → |num| = |400·8 − 4·4000|
    assert(r.getAs[Long]("score_num") === 12800L, r.toString)
    assert(r.getAs[Long]("n_upto") === 4L && r.getAs[Long]("n_total") === 8L)
  }

  test("q191 bitmap rollup: month bitmap deduplicates exactly what the daily sum double-counts") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // Jan: u7 active on two days (daily sum counts it twice, month once),
    // u8 on one day; Feb: u9 only
    val rows = Seq(
      (1L, 1L * dayNs, 7L, "view", 0.0, "{}"),
      (2L, 2L * dayNs, 7L, "view", 0.0, "{}"),
      (3L, 2L * dayNs, 8L, "view", 0.0, "{}"),
      (4L, 40L * dayNs, 9L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftbmr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q191_bitmap_rollup")(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("month").toString,
        r.getAs[Long]("n_days"), r.getAs[Long]("sum_daily_distinct"),
        r.getAs[Long]("month_distinct")))
    assert(got.toList === List(
      ("1970-01-01", 2L, 3L, 2L), ("1970-02-01", 1L, 1L, 1L)),
      got.mkString(","))
  }

  test("q187 KS drift: mirrored halves give D = 0; disjoint supports give D = 1e6 at the base maximum") {
    import spark.implicits._
    def write(dir: String, rows: Seq[(Double, String)]): Unit =
      rows.zipWithIndex.map { case ((price, day), i) =>
        (i.toLong, i.toLong, "O", price,
          java.sql.Timestamp.valueOf(s"$day 00:00:00"), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graftks").toString
    write(dir, Seq((1.0, "1995-01-01"), (5.0, "1995-01-01"),
      (1.0, "1995-01-10"), (5.0, "1995-01-10")))
    val zero = SparkEntry.queries("q187_ks_drift")(spark, dir).head()
    assert(zero.getAs[Long]("d_ppm") === 0L, zero.toString)
    // argmax tie at D = 0 everywhere → smallest value wins
    assert(zero.getAs[Long]("at_value_cents") === 100L, zero.toString)
    val dir2 = java.nio.file.Files.createTempDirectory("graftks2").toString
    write(dir2, Seq((1.0, "1995-01-01"), (2.0, "1995-01-02"),
      (8.0, "1995-01-09"), (9.0, "1995-01-10")))
    val full = SparkEntry.queries("q187_ks_drift")(spark, dir2).head()
    // base = {100, 200}, curr = {800, 900}: at value 200 F1 = 1, F2 = 0
    assert(full.getAs[Long]("d_ppm") === 1000000L, full.toString)
    assert(full.getAs[Long]("at_value_cents") === 200L, full.toString)
    assert(full.getAs[Long]("n1") === 2L && full.getAs[Long]("n2") === 2L)
  }

  test("q180 rolling MAU: each user-day serves its 7-day window once; trailing partial windows drop") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // u7 active on epoch days 1 and 3; u8 on day 8 (= last day → hi)
    val rows = Seq(
      (1L, 1L * dayNs, 7L, "view", 0.0, "{}"),
      (2L, 3L * dayNs, 7L, "click", 0.0, "{}"),
      (3L, 3L * dayNs + 5L, 7L, "view", 0.0, "{}"), // same user-day: dedup
      (4L, 8L * dayNs, 8L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftmau").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q180_rolling_mau")(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        r.getAs[Long]("mau7")).toMap
    // u7's day-1 activity serves windows 1..7, day-3 serves 3..8 (9 is
    // past hi); u8 serves window 8 only → days 1..7 count 1, day 8 counts 2
    assert(got === (1L to 7L).map(_ -> 1L).toMap + (8L -> 2L), got.toString)
  }

  test("q183 MAD outliers: a wild value cannot move the median; symmetric spread flags nothing") {
    import spark.implicits._
    val rows = Seq(
      // type a: 4× value 1.00 + one wild 100.00 → med=100c, MAD=0 → 1 outlier
      (1L, 1000000000L, 1L, "a", 1.0, "{}"),
      (2L, 2000000000L, 2L, "a", 1.0, "{}"),
      (3L, 3000000000L, 3L, "a", 1.0, "{}"),
      (4L, 4000000000L, 4L, "a", 1.0, "{}"),
      (5L, 5000000000L, 5L, "a", 100.0, "{}"),
      // type b: {10, 20, 30} → med=2000c, MAD=1000c, 3·1.4826·MAD > every dev
      (6L, 1000000000L, 1L, "b", 10.0, "{}"),
      (7L, 2000000000L, 2L, "b", 20.0, "{}"),
      (8L, 3000000000L, 3L, "b", 30.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftmad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q183_mad_outliers")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
        r.getAs[Double]("med"), r.getAs[Double]("mad"),
        r.getAs[Long]("n_outliers")))).toMap
    assert(got("a") === ((5L, 100.0, 0.0, 1L)), got.toString)
    assert(got("b") === ((3L, 2000.0, 1000.0, 0L)), got.toString)
  }

  test("q184 bitmap index: popcounted AND equals the exact distinct intersection across word boundaries") {
    import spark.implicits._
    // view users {1,2,3,64}, purchase users {2,64,100} — 64 and 100 sit in
    // bitmap words 2 and 3, so the intersection {2,64} spans two words;
    // duplicate events must not double-count (bit_or is idempotent)
    val rows = Seq(
      (1L, 1L, "view"), (2L, 2L, "view"), (3L, 3L, "view"),
      (4L, 64L, "view"), (5L, 1L, "view"),
      (6L, 2L, "purchase"), (7L, 64L, "purchase"), (8L, 100L, "purchase"),
      (9L, 64L, "purchase"))
      .map { case (id, u, t) => (id, id * 1000000000L, u, t, 0.0, "{}") }
    val dir = java.nio.file.Files.createTempDirectory("graftbmp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q184_bitmap_index")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_both"))
      .toMap
    assert(got === Map(
      ("purchase", "purchase") -> 3L,
      ("purchase", "view") -> 2L,
      ("view", "view") -> 4L), got.toString)
  }

  test("q201 linear interp: interior gaps take the exact convex combination; observed days pass through") {
    import spark.implicits._
    // purchases 3.00 on day 0 and 9.00 on day 3 → cents 300/900; days 1-2
    // interpolate to (300·2+900·1)/3 = 500 and (300·1+900·2)/3 = 700; a
    // view mid-gap must not count as an observation
    val dayNs = 86400L * 1000000000L
    val rows = Seq(
      (1L, 0L * dayNs + 1, 7L, "purchase", 3.0, "{}"),
      (2L, 3L * dayNs + 1, 7L, "purchase", 9.0, "{}"),
      (3L, 1L * dayNs + 1, 7L, "view", 555.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftinterp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q201_linear_interp")(spark, dir).collect()
      .map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getAs[Long]("interp_cents"), r.getAs[Boolean]("observed")))
    assert(got.toList === List(
      (Some(300L), 300L, true),
      (None, 500L, false),
      (None, 700L, false),
      (Some(900L), 900L, true)), got.toList.toString)
  }

  test("q203 calibration: planted score spread gives hand-computed bins, gaps, and Brier") {
    import spark.implicits._
    // u1: 10 views + purchase (pred 1e6, label 1); u2: 5 views (5e5, 0);
    // u3: 1 view (1e5, 0). Brier = (0 + 25e10 + 1e10)/(3·1e6) = 86666
    def views(uid: Long, k: Int, base: Long) = (0 until k).map(i =>
      (base + i, (base + i) * 1000000000L, uid, "view", 0.0, "{}"))
    val rows = views(1L, 10, 100) ++ views(2L, 5, 200) ++ views(3L, 1, 300) ++
      Seq((400L, 400L * 1000000000L, 1L, "purchase", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftcalib").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q203_calibration")(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Long]("mean_pred_ppm"), r.getAs[Long]("frac_pos_ppm"),
        r.getAs[Long]("gap_ppm"), r.getAs[Long]("brier_micro")))
    assert(got.toList === List(
      (1L, 1L, 100000L, 0L, 100000L, 86666L),
      (5L, 1L, 500000L, 0L, 500000L, 86666L),
      (9L, 1L, 1000000L, 1000000L, 0L, 86666L)), got.toList.toString)
  }

  test("q209 weighted quantiles: planted weights pull the median to the hand-computed value") {
    import spark.implicits._
    // flag A: qty 10 w100, qty 20 w200, qty 30 w100 → total 400 cents;
    // cum 100/300/400 → p25 = 10 (4·100 ≥ 400), median = 20 (2·300 ≥
    // 400), p75 = 20 (4·300 ≥ 1200)
    val rows = Seq(
      ("A", 1.00, 10.0), ("A", 2.00, 20.0), ("A", 1.00, 30.0),
      ("B", 5.00, 7.0))
    val dir = java.nio.file.Files.createTempDirectory("graftwq").toString
    rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q209_weighted_quantiles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toList === List(
      ("A", 400L, 10L, 20L, 20L),
      ("B", 500L, 7L, 7L, 7L)), got.mkString(","))
  }

  test("q213 mutual information: a perfectly dependent pair gives MI = H and NMI = 1e6") {
    import spark.implicits._
    // views only on Sunday (epoch day 3), purchases only on Monday (day
    // 4), two of each: every cell term is ln 2 → MI = Hx = Hy = 693147
    // µnats and NMI is exactly 1e6
    val dayNs = 86400L * 1000000000L
    val rows = Seq(
      (1L, 3L * dayNs + 1, 1L, "view", 0.0, "{}"),
      (2L, 3L * dayNs + 2, 2L, "view", 0.0, "{}"),
      (3L, 4L * dayNs + 1, 3L, "purchase", 0.0, "{}"),
      (4L, 4L * dayNs + 2, 4L, "purchase", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftmi").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q213_mutual_info")(spark, dir).head()
    assert((r.getAs[Long]("n"), r.getAs[Long]("n_cells"),
      r.getAs[Long]("mi_micro"), r.getAs[Long]("hx_micro"),
      r.getAs[Long]("hy_micro"), r.getAs[Long]("nmi_ppm"))
      === ((4L, 2L, 693147L, 693147L, 693147L, 1000000L)), r.toString)
  }

  test("q218 Benford: planted digits give exact observed ppm and signed deviations; zero totals drop") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 1.00, "x"), (2L, 2L, 1.50, "x"), (3L, 3L, 199.99, "x"),
      (4L, 4L, 2.50, "x"), (5L, 5L, 95.00, "x"), (6L, 6L, 0.00, "x"))
    val dir = java.nio.file.Files.createTempDirectory("graftbenford").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q218_benford_audit")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // totals 100/150/19999/250/9500 cents → digits 1,1,1,2,9; the 0.00
    // row is excluded. obs: d1 600000, d2 200000, d9 200000
    assert(got.length === 9)
    assert(got(0) === ((1L, 3L, 600000L, 301030L, 298970L)), got(0).toString)
    assert(got(1) === ((2L, 1L, 200000L, 176091L, 23909L)), got(1).toString)
    assert(got(2) === ((3L, 0L, 0L, 124939L, -124939L)), got(2).toString)
    assert(got(8) === ((9L, 1L, 200000L, 45757L, 154243L)), got(8).toString)
  }

  test("q220 conversion latency: planted first-view/first-purchase pairs give exact mean and hour quantiles") {
    import spark.implicits._
    val h = 3600L * 1000000000L // ns per hour
    val rows = Seq(
      // u1: view then purchase 2h later; a later view must not move v
      (1L, 0L * h + 1, 1L, "view", 0.0, "{}"),
      (2L, 2L * h + 1, 1L, "purchase", 0.0, "{}"),
      (3L, 5L * h + 1, 1L, "view", 0.0, "{}"),
      // u2: 10h latency
      (4L, 1L * h + 1, 2L, "view", 0.0, "{}"),
      (5L, 11L * h + 1, 2L, "purchase", 0.0, "{}"),
      // u3: never converts; u4: purchase precedes view → dropped
      (6L, 0L * h + 1, 3L, "view", 0.0, "{}"),
      (7L, 0L * h + 1, 4L, "purchase", 0.0, "{}"),
      (8L, 1L * h + 1, 4L, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftconv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q220_conversion_latency")(spark, dir).head()
    assert((r.getAs[Long]("n_converted"), r.getAs[Long]("mean_latency_us"),
      r.getAs[Long]("p50_hours"), r.getAs[Long]("p90_hours"))
      === ((2L, 21600000000L, 2L, 10L)), r.toString)
  }

  test("q222 bot signatures: a replayed click path recurs across users; singletons are cut") {
    import spark.implicits._
    val sNs = 1000000000L
    def sess(uid: Long, base: Long, types: Seq[String]) =
      types.zipWithIndex.map { case (tp, i) =>
        (base + i, (base + i) * sNs, uid, tp, 0.0, "{}")
      }
    val bot = Seq("view", "click", "purchase")
    val rows = sess(1L, 100, bot) ++ sess(2L, 200, bot) ++
      sess(3L, 300, bot) ++
      // user 1's second session, one hour later, same shape
      sess(1L, 10000, bot) ++
      // a one-off shape must be cut by the >= 2 multiplicity filter
      sess(4L, 400, Seq("view", "view"))
    val dir = java.nio.file.Files.createTempDirectory("graftbot").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q222_bot_signatures")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toList === List((4L, 3L, 3L)), got.mkString(","))
  }

  test("q224 seasonal index: planted month revenues give exact cross-multiplied indexes") {
    import spark.implicits._
    // Jan-95 100, Jan-96 100, Feb-95 400 → Jan index 0.5e6, Feb 2e6
    val rows = Seq(
      (1L, 1L, 100.0, java.sql.Timestamp.valueOf("1995-01-10 00:00:00")),
      (2L, 2L, 100.0, java.sql.Timestamp.valueOf("1996-01-20 00:00:00")),
      (3L, 3L, 400.0, java.sql.Timestamp.valueOf("1995-02-05 00:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graftseasidx").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q224_seasonal_index")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toList === List(
      (1, 2L, 20000L, 500000L), (2, 1L, 40000L, 2000000L)),
      got.mkString(","))
  }

  test("q225 event trigrams: ordered sequences count with distinct-user support") {
    import spark.implicits._
    val sNs = 1000000000L
    def seq4(uid: Long, base: Long, types: Seq[String]) =
      types.zipWithIndex.map { case (tp, i) =>
        (base + i, (base + i) * sNs, uid, tp, 0.0, "{}")
      }
    val rows = seq4(1L, 100, Seq("view", "click", "purchase", "view")) ++
      seq4(2L, 200, Seq("view", "click", "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("grafttri").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q225_event_trigrams")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toList === List(
      ("view", "click", "purchase", 2L, 2L),
      ("click", "purchase", "view", 1L, 1L)), got.mkString(","))
  }

  test("q226 cohort LTV: cumulative revenue accrues per cohort by month offset") {
    import spark.implicits._
    def ns(sql: String): Long =
      java.sql.Timestamp.valueOf(sql).getTime * 1000000L
    val rows = Seq(
      (1L, ns("2020-01-10 00:00:00"), 1L, "purchase", 10.0, "{}"),
      (2L, ns("2020-02-15 00:00:00"), 1L, "purchase", 20.0, "{}"),
      (3L, ns("2020-02-20 00:00:00"), 2L, "purchase", 40.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftltv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q226_cohort_ltv")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // cohort_month0 is 0-BASED (mcode = y*12 + (m-1)): January = 0,
    // February = 1 — the labeling that keeps December cohorts in their
    // own calendar year
    assert(got.toList === List(
      (2020, 0, 0L, 1L, 1L, 1000L, 1000L, 1000L),
      (2020, 0, 1L, 1L, 1L, 2000L, 3000L, 3000L),
      (2020, 1, 0L, 1L, 1L, 4000L, 4000L, 4000L)), got.mkString(","))
  }

  test("q228 trending items: a burst over a full 4-week baseline lifts; short histories are withheld") {
    import spark.implicits._
    def day(k: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 1).plusDays(7L * k).atStartOfDay())
    // part 1: weeks 0-3 one order each, week 4 bursts to 8; part 2 has
    // only 3 weeks of history before its burst → withheld
    val p1 = (0 to 3).map(k => (100L + k, day(k), 1L)) ++
      (0 until 8).map(i => (200L + i, day(4), 1L))
    val p2 = (0 to 2).map(k => (300L + k, day(k), 2L)) ++
      Seq((400L, day(3), 2L))
    val rows = p1 ++ p2
    val dir = java.nio.file.Files.createTempDirectory("grafttrend2").toString
    rows.map { case (ok, dt, _) => (ok, dt) }.distinct
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    rows.map { case (ok, _, p) => (ok, p) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q228_trending_items")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toList === List((1L, 4L, 8L, 4L, 8000000L)),
      got.mkString(","))
  }

  test("q233 json profile: data-discovered keys classify mixed value types exactly") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1000000000L, 1L, "view", 0.0, """{"a": 1, "b": "x"}"""),
      (2L, 2000000000L, 2L, "view", 0.0, """{"a": 2.5, "c": true}"""),
      (3L, 3000000000L, 3L, "view", 0.0, """{"a": 7}"""))
    val dir = java.nio.file.Files.createTempDirectory("graftjsonp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q233_json_profile")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toList === List(
      ("a", 3L, 2L, 1L, 0L, 0L, 3L),
      ("b", 1L, 0L, 0L, 0L, 1L, 1L),
      ("c", 1L, 0L, 0L, 1L, 0L, 1L)), got.mkString(","))
  }

  test("q245 converged SCC: label-sum trajectories monotone, final pair equal (the convergence certificate)") {
    val (out, fTraj, bTraj) = operators.Graph.sccConvergedRun(spark, sf)
    Seq(("fwd", fTraj), ("bwd", bTraj)).foreach { case (tag, traj) =>
      assert(traj.size >= 2, s"$tag: loop must run at least one round")
      // labels only decrease → the sum falls monotonically...
      traj.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a, s"$tag trajectory not monotone: $traj")
      }
      // ...and the loop terminates exactly when a round changes nothing
      assert(traj(traj.size - 1) == traj(traj.size - 2),
        s"$tag trajectory did not settle: $traj")
    }
    // every emitted class claims converged labels (n_moved_final = 0,
    // the column the oracle recomputes from its own unroll)
    out.collect().foreach(r => assert(r.getLong(4) == 0L))
  }

  test("q265 local clustering: summary triangle total equals q138's global count; lcc bounded; hubs ranked") {
    val rows = q("q265_local_clustering").collect().sortBy(_.getInt(0))
    assert(rows.length === 11)
    val top = rows.filter(_.getInt(0) < 10)
    // top-10 by degree, deterministic tiebreak
    val degs = top.map(_.getAs[Long]("degree"))
    degs.sliding(2).foreach { w => assert(w(1) <= w(0)) }
    top.foreach { r =>
      val (dg, tri, ppm) = (r.getAs[Long]("degree"),
        r.getAs[Long]("n_triangles"), r.getAs[Long]("lcc_ppm"))
      assert(tri <= dg * (dg - 1) / 2, "a node's triangles exceed its wedges")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
    // the summary row's triangle total must equal q138's global count —
    // two independent formulations (per-corner credits // 3 vs the
    // oriented intersection sum) of the same quantity
    val summary = rows.last
    assert(summary.getAs[Long]("node") === -1L)
    val q138T = q("q138_triangle_count").collect()(0)
      .getAs[Long]("n_triangles")
    assert(summary.getAs[Long]("n_triangles") === q138T)
    assert(summary.getAs[Long]("lcc_ppm") >= 0L &&
      summary.getAs[Long]("lcc_ppm") <= 1000000L)
  }

  test("q277 Theil-Sen: a planted outlier month leaves the median slope exact while OLS is dragged") {
    val r = q("q277_theil_sen").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_pairs") ===
      r(0).getAs[Long]("n_months") * (r(0).getAs[Long]("n_months") - 1) / 2)
    // planted: 10 monthly points rising exactly $1.00/month, month 5
    // replaced by a 100x outlier — the median pairwise slope stays the
    // true 100 cents/month (1e8 micro-cents) because 36 of 45 pairs are
    // clean; OLS is pulled far off it
    import spark.implicits._
    val orders = (0 until 10).map { m =>
      val price = if (m == 5) 10000.0 else 10.0 + m * 1.0
      (m.toLong, f"2020-${m + 1}%02d-01", price)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftts").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q277_theil_sen")(spark, dir).collect()(0)
    assert(got.getAs[Long]("n_months") === 10L)
    assert(got.getAs[Long]("n_pairs") === 45L)
    assert(got.getAs[Long]("theilsen_slope_micro") === 100000000L,
      "the robust estimator must recover the clean slope exactly")
    assert(math.abs(got.getAs[Long]("ols_slope_micro") - 100000000L) >
      100000000L, "OLS must be visibly dragged by the outlier")
  }

  test("q307 ACF: the fixture diagnostic is bounded and a planted antisymmetric seasonal hits its exact lag-6/lag-12 ppm") {
    // fixture corpus: 12 lags, pair counts exact, Cauchy-Schwarz bound
    val r = q("q307_acf").collect()
    val acfLags = graft.operators.Stats.acfMaxLag
    assert(r.length === acfLags)
    val nMonths = r(0).getAs[Long]("n_months")
    r.foreach { row =>
      val lag = row.getAs[Int]("lag")
      assert(row.getAs[Long]("n_pairs") === nMonths - lag)
      assert(math.abs(row.getAs[Long]("acf_ppm")) <= 1000000L, row.toString)
    }
    assert(r.map(_.getAs[Int]("lag")).toList === (1 to acfLags).toList)
    // planted law: c_t = A + S[t mod 12] over 36 months with S
    // ANTISYMMETRIC (S[i+6] = −S[i], so ΣS = 0 and μ = A exactly).
    // Every lag-12 product is +S², every lag-6 product is −S², so
    // acf(12) = (2E·1e6) div (3E) = 666666 and acf(6) = −833333
    // EXACTLY, independent of the seasonal amplitudes — the
    // hand-checkable law behind the q303 spike-reading
    import spark.implicits._
    val a6 = Vector(600L, 300L, 120L, 60L, 24L, 12L)
    val S = a6 ++ a6.map(-_)
    val A = 1000000L
    val orders = (0 until 36).map { t =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01",
        (A + S(t % 12)) / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftacf").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q307_acf")(spark, dir).collect()
      .map(row => (row.getAs[Int]("lag"), row.getAs[Long]("acf_ppm"))).toMap
    assert(got(12) === 666666L, got.toString)
    assert(got(6) === -833333L, got.toString)
  }

  test("q318 time-decay attribution: the ledger closes at exactly 1e6 per conversion; a planted three-gap user hits the hand credits") {
    // fixture conservation: every purchase's credit sums to exactly 1e6
    val rows = q("q318_time_decay").collect()
    val nPurch = graft.sources.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions
        .col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("decay_ppm")).sum === 1000000L * nPurch,
      "closed ledger")
    // planted: one conversion touched at 1 h (g=0, w=1e6), 2.5 d (g=2,
    // w=250000), and 6.5 d (g=6, w=15625) → credits 790123/197530/12345
    // with the 2-ppm remainder to the largest-raw channel (view); a
    // second user's untouched purchase credits (none) in full
    import spark.implicits._
    val T = (1704067200L + 10L * 86400L) * 1000000000L
    def back(sec: Long) = T - sec * 1000000000L
    val evs = Seq(
      (1L, back(3600L), 1L, "view"),
      (2L, back(216000L), 1L, "click"),          // 2.5 days
      (3L, back(561600L), 1L, "signup"),         // 6.5 days
      (4L, T, 1L, "purchase"),
      (5L, T, 2L, "purchase"))
      .map(e => (e._1, e._2, e._3, e._4, 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftdecay").toString
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q318_time_decay")(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_convs"),
        r.getAs[Long]("decay_ppm"))).toList
    assert(got === List(("(none)", 1L, 1000000L), ("click", 1L, 197530L),
      ("signup", 1L, 12345L), ("view", 1L, 790125L)), got.toString)
  }

  test("q317 forecast interval: fixture ledger is consistent; a pure ramp earns a zero-width band and a test-region spike punctures it") {
    val r = q("q317_forecast_interval").head()
    val months = graft.sources.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.expr(
        "year(o_orderdate) * 12 + month(o_orderdate)")).distinct().count()
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") === months - 1,
      "every month after t=0 is scored exactly once")
    assert(r.getAs[Long]("coverage_ppm") ===
      r.getAs[Long]("n_covered") * 1000000L / r.getAs[Long]("n_test"))
    assert(r.getAs[Long]("coverage_ppm") >= 0L &&
      r.getAs[Long]("coverage_ppm") <= 1000000L)
    // planted pure ramp: Holt tracks it EXACTLY from t=1 (the init
    // recovers the true level and trend, and exactness is preserved by
    // induction through the ppm smoothing), so q̂ = 0 and coverage is a
    // perfect 1e6. n = 35 scores → n_cal = ⌈70/3⌉ = 24, n_test = 11
    import spark.implicits._
    def ramp(spike: Map[Int, Long]): String = {
      val orders = (0 until 36).map { t =>
        (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01",
          (1000000L + 200L * t + spike.getOrElse(t, 0L)) / 100.0)
      }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      val dir = java.nio.file.Files.createTempDirectory("graftfi").toString
      orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    val clean = SparkEntry.queries("q317_forecast_interval")(
      spark, ramp(Map.empty)).head()
    assert(clean.getAs[Long]("n_cal") === 24L)
    assert(clean.getAs[Long]("n_test") === 11L)
    assert(clean.getAs[Long]("qhat_cents") === 0L)
    assert(clean.getAs[Long]("coverage_ppm") === 1000000L)
    // the same ramp with one spike INSIDE the test region: calibration
    // stays clean (q̂ still 0), the spike month misses the band, and the
    // recurrence's recovery months miss too — coverage drops below 1e6,
    // exactly the alarm the audit exists to ring
    val spiked = SparkEntry.queries("q317_forecast_interval")(
      spark, ramp(Map(30 -> 77700L))).head()
    assert(spiked.getAs[Long]("qhat_cents") === 0L)
    assert(spiked.getAs[Long]("n_covered") < spiked.getAs[Long]("n_test"))
    assert(spiked.getAs[Long]("coverage_ppm") < 1000000L)
  }

  test("q316 sequential patterns: ledger is consistent on the fixture; a planted three-user stream yields the hand-counted supports") {
    val rows = q("q316_seq_patterns").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getAs[Long]("sup"),
        r.getAs[Long]("sup_ppm")))
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    rows.foreach { case (pat, len, sup, ppm) =>
      assert(len === pat.count(_ == '>') + 1)
      assert(sup >= 1L && sup <= nUsers, pat)
      assert(ppm === sup * 1000000L / nUsers, pat)
    }
    // a triple's support can never exceed either embedded pair's
    val sups = rows.map(r => r._1 -> r._3).toMap
    rows.filter(_._2 == 3).foreach { case (pat, _, sup, _) =>
      val Array(a, b, c) = pat.split(">")
      assert(sup <= sups.getOrElse(s"$a>$b", 0L), pat)
      assert(sup <= sups.getOrElse(s"$b>$c", 0L), pat)
    }
    // planted: u1 view→click→purchase, u2 view→purchase, u3 click→view.
    // Hand counts: view>purchase 2 (u1, u2); view>click, click>purchase,
    // click>view 1 each; view>click>purchase the only triple
    import spark.implicits._
    val t0 = 1704067200L * 1000000000L
    val evs = Seq(
      (1L, t0 + 1e9.toLong, 1L, "view"), (2L, t0 + 2e9.toLong, 1L, "click"),
      (3L, t0 + 3e9.toLong, 1L, "purchase"),
      (4L, t0 + 1e9.toLong, 2L, "view"), (5L, t0 + 2e9.toLong, 2L, "purchase"),
      (6L, t0 + 1e9.toLong, 3L, "click"), (7L, t0 + 2e9.toLong, 3L, "view"))
      .map(e => (e._1, e._2, e._3, e._4, 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graftseq").toString
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q316_seq_patterns")(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("sup"))).toList
    val want = List(("view>purchase", 2L), ("click>purchase", 1L),
      ("click>view", 1L), ("view>click", 1L), ("view>click>purchase", 1L))
    assert(got === want, got.toString)
  }

  test("q315 energy distance: fixture components are consistent; a planted three-point corpus hits the hand value exactly") {
    val r = q("q315_energy_drift").head()
    val n = graft.sources.Tables.orders(spark, sf).count()
    assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_cur") === n)
    assert(r.getAs[Long]("exx_microcents") >= 0L &&
      r.getAs[Long]("eyy_microcents") >= 0L &&
      r.getAs[Long]("exy_microcents") >= 0L)
    // true energy distance is ≥ 0; per-term truncation can shave ≤ 2 µ¢
    assert(r.getAs[Long]("energy_microcents") >= -2L, r.toString)
    // planted: base = {$10.00, $12.00}, current = {$11.00} →
    // E|X−Y| = 100¢, E|X−X'| = (0+200+200+0)/4 = 100¢, E|Y−Y'| = 0,
    // energy = 2·100 − 100 − 0 = 100¢ = 100 000 000 µ¢ exactly
    import spark.implicits._
    val orders = Seq(
      (1L, "2020-01-01", 10.00), (2L, "2020-01-01", 12.00),
      (3L, "2020-01-31", 11.00))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftenergy").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q315_energy_drift")(spark, dir).head()
    assert(got.getAs[Long]("n_base") === 2L && got.getAs[Long]("n_cur") === 1L)
    assert(got.getAs[Long]("exy_microcents") === 100000000L, got.toString)
    assert(got.getAs[Long]("exx_microcents") === 100000000L, got.toString)
    assert(got.getAs[Long]("eyy_microcents") === 0L, got.toString)
    assert(got.getAs[Long]("energy_microcents") === 100000000L, got.toString)
  }

  test("q313 PACF: fixture lags complete and pacf(1) = acf(1); a planted alternation collapses to truncation noise after lag 1") {
    val r = q("q313_pacf").collect()
      .map(x => (x.getAs[Int]("lag"), x.getAs[Long]("pacf_ppm")))
    assert(r.nonEmpty && r.head === ((1,
      q("q307_acf").collect()
        .find(_.getAs[Int]("lag") == 1).get.getAs[Long]("acf_ppm"))),
      "pacf(1) must equal acf(1) by definition")
    assert(r.map(_._1).toList === (1 to r.length).toList)
    // planted: 36 months alternating A ± s — an (extreme) AR(1)
    // signature. The exact ACF is ±(36−k)/36 ppm-truncated at every
    // lag (|acf| never drops below 0.66), yet the PACF collapses to
    // ±1.7% truncation residue from lag 2 on: the whole alternation is
    // explained by one lag — the AR-order read q307 alone cannot give.
    // Expected values are the hand-run fixed-point Durbin-Levinson on
    // the hand-derived ACF integers
    import spark.implicits._
    val orders = (0 until 36).map { t =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01",
        (1000000L + (if (t % 2 == 0) 100L else -100L)) / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftpacf").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q313_pacf")(spark, dir).collect()
      .map(x => (x.getAs[Int]("lag"), x.getAs[Long]("pacf_ppm"))).toList
    val want = List((1, -972222L), (2, -14084L), (3, 14272L),
      (4, -14477L), (5, 14698L), (6, -14943L), (7, 15159L), (8, -15376L),
      (9, 15606L), (10, -15891L), (11, 16135L), (12, -16379L))
    assert(got === want, got.toString)
    // under 13 months the ACF vector is short and the walk TRUNCATES to
    // the lags available (a 6-month series proves lags 1..5), exactly as
    // the oracle's recursive CTE stops at its r.nl bound — graceful, not
    // an engine-exception-vs-oracle-rows divergence (the r14 advisor
    // finding); pacf(1) = acf(1) still holds on the short series
    val shortDir = java.nio.file.Files.createTempDirectory("graftpacfs").toString
    orders.limit(6).write.mode("overwrite").parquet(s"$shortDir/orders.parquet")
    val short = SparkEntry.queries("q313_pacf")(spark, shortDir).collect()
      .map(x => (x.getAs[Int]("lag"), x.getAs[Long]("pacf_ppm"))).toList
    assert(short.nonEmpty && short.length <= 5, short.toString)
    assert(short.map(_._1) === (1 to short.length).toList, short.toString)
    val shortAcf1 = SparkEntry.queries("q307_acf")(spark, shortDir).collect()
      .find(_.getAs[Int]("lag") == 1).get.getAs[Long]("acf_ppm")
    assert(short.head._2 === shortAcf1, short.toString)
  }

  test("q319 AR fit: a planted AR(2) selects order 2, phi matches an independent fixed-point replay exactly, and the AR column beats every smoother in the q306 backtest") {
    import spark.implicits._
    // x_t = 1.1·x_{t−1} − 0.5·x_{t−2} + LCG shock — complex AR(2) roots
    // give a damped ~8.5-month quasi-cycle no smoother state models:
    // Holt has no oscillation, seasonal-naive's period-12 lag is wrong
    val A = 500000L
    var seed = 42L
    def lcg(): Long = {
      seed = (seed * 1103515245L + 12345L) % (1L << 31)
      seed % 2001L - 1000L
    }
    var x1 = 0.0; var x2 = 0.0
    val cents = (0 until 60).map { _ =>
      val x = 1.1 * x1 - 0.5 * x2 + lcg() * 40.0
      x2 = x1; x1 = x
      A + x.toLong
    }
    val orders = cents.zipWithIndex.map { case (c, t) =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftar").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // ---- independent replay: ACF → Durbin–Levinson → cutoff →
    // forecast, all in BigInt toward-zero fixed point (written from the
    // formulas, not the engine code — the randomized-law discipline) ----
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / is toward-zero
    val n = cents.length
    val mu = tdiv(cents.map(BigInt(_)).sum, n).toLong
    val dv = cents.map(_ - mu)
    val den = dv.map(x => BigInt(x) * x).sum
    val rho = (1 to 12).map { k =>
      tdiv((0 until n - k).map(t => BigInt(dv(t)) * dv(t + k)).sum
        * 1000000, den).toLong
    }
    var phiRow = Vector(rho(0))
    var v = 1000000L - tdiv(BigInt(rho(0)) * rho(0), 1000000L).toLong
    var rows = Vector((1, phiRow, v)); var k = 1
    while (k < rho.length && v > 0) {
      val num = BigInt(rho(k)) * 1000000L -
        (1 to k).map(j => BigInt(phiRow(j - 1)) * rho(k - j)).sum
      val pk = tdiv(num, v).toLong
      phiRow = (1 to k).map(j => phiRow(j - 1) -
        tdiv(BigInt(pk) * phiRow(k - j), 1000000L).toLong).toVector :+ pk
      v = tdiv(BigInt(v) * (1000000L -
        tdiv(BigInt(pk) * pk, 1000000L).toLong), 1000000L).toLong
      k += 1; rows = rows :+ ((k, phiRow, v))
    }
    val p = rows.collect { case (kk, ph, _)
      if BigInt(ph.last) * ph.last * n >= BigInt("4000000000000") => kk }.max
    val phiP = rows(p - 1)._2
    assert(p === 2, rows.map(r => (r._1, r._2.last)).toString)
    // the planted (1.1, −0.5) recovered to sample-YW resolution
    assert(math.abs(phiP(0) - 1100000L) < 100000L, phiP.toString)
    assert(math.abs(phiP(1) + 500000L) < 50000L, phiP.toString)

    val got = SparkEntry.queries("q319_ar_forecast")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.collect { case ("order", _, _, pv, _) => pv }.toList
      === List(p.toLong), got.take(3).mkString(","))
    assert(got.collect { case ("phi", j, _, ph, _) => (j, ph) }.toList
      === phiP.zipWithIndex.map { case (ph, j) => ((j + 1).toLong, ph) },
      "phi must equal the independent replay exactly (ppm)")
    def pred(devs: IndexedSeq[Long], t: Int): Long =
      mu + tdiv((1 to p).map(j => BigInt(phiP(j - 1)) * devs(t - j)).sum,
        1000000L).toLong
    val wantF = (p until n).map(t =>
      (t.toLong, cents(t), pred(dv, t), math.abs(cents(t) - pred(dv, t))))
    assert(got.collect { case ("forecast", m, a, f, e) => (m, a, f, e) }
      .toList === wantF.toList)
    var ring = dv.toVector
    val wantH = (0 until 3).map { h =>
      val f = pred(ring, ring.length); ring = ring :+ (f - mu)
      ((n + h).toLong, f)
    }
    assert(got.collect { case ("horizon", m, _, f, _) => (m, f) }.toList
      === wantH.toList)

    // the backtest: the AR member beats every smoother out of fit on
    // its own generating process — the estimation rung earns its seat.
    // The q351 MA member is the ONE allowed exception: an AR(2)'s ACF
    // TAILS instead of cutting off, so the ACF-cutoff rule reads
    // q̂ = 11 and the 11-parameter MA out-fits the 2-parameter AR
    // in residual MAE (q306's documented full-sample honesty note —
    // in-sample error rewards parameters; the PACF, which q313 reads,
    // is how the practitioner avoids that misidentification)
    val bt = SparkEntry.queries("q306_forecast_backtest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
      .toList
    val arMae = bt.find(_._1 == "ar").get
    bt.filter(m => m._1 != "ar" && m._1 != "ma").foreach { m =>
      assert(m._2 > arMae._2 && !m._3, bt.toString)
    }
  }

  test("q351 MA fit: a planted MA(1) selects order 1 off the ACF cutoff, theta matches an independent fixed-point replay exactly, the horizon reverts to the mean past lag q, and the MA column wins the q306 backtest") {
    import spark.implicits._
    // x_t = μ + e_t + 0.6·e_{t−1}, LCG shocks — the ACF-cutoff
    // signature (ρ₁ = θ/(1+θ²) ≈ 0.44 significant, ρ₂.. noise) that
    // q307 detects and that, before q351, had no matching estimator
    val A = 500000L
    var seed = 7L
    def lcg(): Long = {
      seed = (seed * 1103515245L + 12345L) % (1L << 31)
      seed % 2001L - 1000L
    }
    var ePrev = 0.0
    val cents = (0 until 60).map { t =>
      val e = lcg() * 40.0
      val x = A + e + (if (t > 0) 0.6 * ePrev else 0.0)
      ePrev = e
      x.toLong
    }
    val orders = cents.zipWithIndex.map { case (c, t) =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftma").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // ---- independent replay: ACF → ACF-cutoff order → innovations
    // triangle → conditional-residual forecasts, in BigInt toward-zero
    // fixed point written from Brockwell & Davis prop. 5.2.2, not the
    // engine code (the q319 replay discipline) ----
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b
    val n = cents.length
    val mu = tdiv(cents.map(BigInt(_)).sum, n).toLong
    val dv = cents.map(_ - mu)
    val den = dv.map(x => BigInt(x) * x).sum
    val rho = (1 to 12).map { k =>
      tdiv((0 until n - k).map(t => BigInt(dv(t)) * dv(t + k)).sum
        * 1000000, den).toLong
    }
    val q = (1 to 12).filter(k => BigInt(rho(k - 1)) * rho(k - 1) * n
      >= BigInt("4000000000000")).max
    assert(q === 1, rho.toString)
    val vs = scala.collection.mutable.ArrayBuffer(BigInt(1000000L))
    val tri = scala.collection.mutable.ArrayBuffer.empty[Vector[BigInt]]
    (1 to 12).foreach { m =>
      if (vs.last > 0) {
        val row = new Array[BigInt](m)
        (0 until m).foreach { k =>
          val s = (0 until k).map(j =>
            tri(k - 1)(k - j - 1) * row(m - j - 1) * vs(j)).sum
          row(m - k - 1) = tdiv(BigInt(rho(m - k - 1)) * 1000000000000L - s,
            vs(k) * 1000000L)
        }
        tri += row.toVector
        vs += BigInt(1000000L) - tdiv((0 until m).map(j =>
          row(m - j - 1) * row(m - j - 1) * vs(j)).sum,
          BigInt(1000000000000L))
      }
    }
    val th = (1 to q).map(j => tri.last(j - 1).toLong)
    // the planted 0.6 recovered to depth-12 innovations resolution —
    // and the depth MATTERS: θ_{1,1} alone is ρ₁ ≈ 355k, badly biased
    assert(math.abs(th(0) - 600000L) < 100000L, th.toString)
    assert(tri.head.head.toLong === rho(0), "depth-1 row is raw ρ₁")

    val got = SparkEntry.queries("q351_ma_forecast")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.collect { case ("order", _, _, qv, _) => qv }.toList
      === List(q.toLong), got.take(3).mkString(","))
    assert(got.collect { case ("theta", j, _, t, _) => (j, t) }.toList
      === th.zipWithIndex.map { case (t, j) => ((j + 1).toLong, t) }.toList,
      "theta must equal the independent replay exactly (ppm)")
    var es = Vector.empty[Long]
    val wantAll = (0 until n).map { t =>
      val s = (1 to math.min(q, t)).map(j => BigInt(th(j - 1)) * es(t - j))
        .sum
      val f = mu + tdiv(s, 1000000L).toLong
      es = es :+ (cents(t) - f)
      (t.toLong, cents(t), f, math.abs(cents(t) - f))
    }
    assert(got.collect { case ("forecast", m, a, f, e) => (m, a, f, e) }
      .toList === wantAll.drop(q).toList)
    val wantH = (1 to 3).map { h =>
      val s = (h to q).map(j => BigInt(th(j - 1)) * es(n + h - 1 - j)).sum
      ((n + h - 1).toLong, mu + tdiv(s, 1000000L).toLong)
    }
    val gotH = got.collect { case ("horizon", m, _, f, _) => (m, f) }.toList
    assert(gotH === wantH.toList)
    // an MA(q) horizon reverts to the mean after q steps BY CONSTRUCTION
    assert(gotH(1)._2 === mu && gotH(2)._2 === mu, gotH.toString)
    assert(gotH(0)._2 !== mu, "h = 1 still carries θ·e_n")

    // the backtest: the MA member beats every other model out of fit on
    // its own generating process — the estimation rung earns its seat
    val bt = SparkEntry.queries("q306_forecast_backtest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
      .toList
    val maMae = bt.find(_._1 == "ma").get
    assert(maMae._3, bt.toString)
    bt.filter(_._1 != "ma").foreach { m =>
      assert(m._2 > maMae._2 && !m._3, bt.toString)
    }
  }

  test("q354 AIPW: both doubly-robust laws hold exactly — a linear truth under confounding recovers via the outcome model, a nonlinear truth recovers via the exact stratum propensities, and a degenerate design reports the sentinel") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // cellSpec: (n, x, y, treated) — x pre-period purchases (also the
    // stratum via x div 3), y post-period purchases, treated = heavy
    // clicker (10 clicks vs 1; 19 control vs 16 treated keeps the
    // pooled click median on the control value, so t = cl > med
    // splits exactly as planted)
    def fixture(cellSpec: Seq[(Int, Long, Long, Boolean)], tag: String)
        : String = {
      var eid = 0L; var uid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      cellSpec.foreach { case (n, x, y, treated) =>
        (1 to n).foreach { _ =>
          uid += 1
          eid += 1; rows += ((eid, 0L, uid, "view", 1.0, "{}"))
          eid += 1; rows += ((eid, 29L * dayNs, uid, "view", 1.0, "{}"))
          (1L to (if (treated) 10L else 1L)).foreach { _ =>
            eid += 1; rows += ((eid, 2L * dayNs, uid, "click", 1.0, "{}"))
          }
          (1L to x).foreach { _ =>
            eid += 1
            rows += ((eid, 1L * dayNs, uid, "purchase", 1.0, "{}"))
          }
          (1L to y).foreach { _ =>
            eid += 1
            rows += ((eid, 20L * dayNs, uid, "purchase", 1.0, "{}"))
          }
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q354_aipw_doubly_robust")(spark, dir).head()
    // LAW 1 — outcome model CORRECT (y = 2 + 3x + 4t exactly linear),
    // allocation heavily confounded (treated mass rises with x): the
    // per-arm fits are exact, every correction term vanishes, and the
    // estimator recovers the planted 4.0 EXACTLY through the model
    val linDir = fixture(Seq(
      (12, 0L, 2L, false), (3, 0L, 6L, true),
      (5, 3L, 11L, false), (5, 3L, 15L, true),
      (2, 6L, 20L, false), (8, 6L, 24L, true)), "graftdr1")
    val lin = run(linDir)
    assert(lin.getAs[Long]("a0_ppm") === 2000000L, lin.toString)
    assert(lin.getAs[Long]("b0_ppm") === 3000000L, lin.toString)
    assert(lin.getAs[Long]("a1_ppm") === 6000000L, lin.toString)
    assert(lin.getAs[Long]("b1_ppm") === 3000000L, lin.toString)
    assert(lin.getAs[Long]("n_used") === 35L && lin.getAs[Long]("n_dropped") === 0L)
    assert(lin.getAs[Long]("ate_dr_micro") === 4000000L, lin.toString)
    assert(lin.getAs[Boolean]("fit_ok"), lin.toString)
    // LAW 2 — outcome model WRONG (y = x² + 4t; the linear fit is the
    // replayed (-1084336 + 5096385·x / -768209 + 6496688·x) — visibly
    // not the truth), but propensities are EXACT within the
    // single-x-value strata: the stratum corrections cancel the model
    // error and the estimator still lands on 4.0 EXACTLY, while the
    // naive read on the same frame (q350's output) is 18.65 — 4.7× off
    val sqDir = fixture(Seq(
      (12, 0L, 0L, false), (3, 0L, 4L, true),
      (5, 3L, 9L, false), (5, 3L, 13L, true),
      (2, 6L, 36L, false), (8, 6L, 40L, true)), "graftdr2")
    val sq = run(sqDir)
    assert(sq.getAs[Long]("a0_ppm") === -1084336L, sq.toString)
    assert(sq.getAs[Long]("b0_ppm") === 5096385L, sq.toString)
    assert(sq.getAs[Long]("a1_ppm") === -768209L, sq.toString)
    assert(sq.getAs[Long]("b1_ppm") === 6496688L, sq.toString)
    assert(sq.getAs[Long]("ate_dr_micro") === 4000000L, sq.toString)
    val naive = SparkEntry.queries("q350_propensity_strat")(spark, sqDir)
      .head().getAs[Long]("naive_micro")
    assert(naive === 18654606L, s"naive $naive")
    // degenerate design: constant x in an arm → det 0 → the sentinel
    // row, never a division (AIPW without an outcome model is q350)
    val degDir = fixture(Seq(
      (5, 0L, 2L, false), (5, 0L, 6L, true)), "graftdr3")
    val deg = run(degDir)
    assert(!deg.getAs[Boolean]("fit_ok"), deg.toString)
    assert(deg.getAs[Long]("ate_dr_micro") === -1L, deg.toString)
  }

  test("q353 UCB1 replay: a randomized fixture replays pick-for-pick against an independent driver-side simulation, and the bandit concentrates on the planted best arm") {
    import spark.implicits._
    val armOf = (1L to 200L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dayNs = 86400L * 1000000000L
    Seq(99L, 4242L).foreach { seed0 =>
      var seed = seed0
      def lcg(): Long = {
        seed = (seed * 1103515245L + 12345L) % (1L << 31); seed
      }
      // randomized logs: each day every user fires 1–3 events; purchase
      // probability rises with the arm id, so arm 3 is the planted best
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      val days = 15
      (0 until days).foreach { dday =>
        (1L to 200L).foreach { u =>
          val a = armOf(u)
          (0 until (1 + (lcg() % 3L).toInt)).foreach { _ =>
            val purch = (lcg() % 100L) < 10L + 20L * a
            eid += 1
            rows += ((eid, dday * dayNs, u,
              if (purch) "purchase" else "view", 1.0, "{}"))
          }
        }
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graftucb$seed0").toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")

      // ---- independent simulation from the RAW fixture rows (own
      // integer sqrt by bisection — not the engine's isqrt) ----
      val cells = rows.groupBy(r => (r._2 / dayNs, armOf(r._3)))
        .map { case (k, rs) =>
          k -> (rs.size.toLong, rs.count(_._4 == "purchase").toLong)
        }
      def bisqrt(x: BigInt): BigInt = {
        var lo = BigInt(0); var hi = x + 1
        while (lo < hi - 1) {
          val mid = (lo + hi) / 2
          if (mid * mid <= x) lo = mid else hi = mid
        }
        lo
      }
      val tr = Array.fill(4)(0L); val sc = Array.fill(4)(0L)
      val dp = Array.fill(4)(0L); var tt = 0L
      val wantPicks = (0 until days).map { dday =>
        val pick = (0 until 4).find(tr(_) == 0L).getOrElse {
          val lg = 63 - java.lang.Long.numberOfLeadingZeros(tt)
          (0 until 4).maxBy { a =>
            ((BigInt(sc(a)) * 1000000L / tr(a) +
              bisqrt(BigInt(1386294L) * lg * 1000000L / tr(a))).toLong, -a)
          }
        }
        val (dt, dr) = cells.getOrElse((dday.toLong, pick.toLong), (0L, 0L))
        tr(pick) += dt; sc(pick) += dr; dp(pick) += 1; tt += dt
        (dday.toLong, pick.toLong, dt, dr)
      }
      val got = SparkEntry.queries("q353_ucb_replay")(spark, dir).collect()
      val gotPicks = got.filter(_.getString(0) == "pick")
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
        .sortBy(_._1).toList
      assert(gotPicks === wantPicks.toList, s"seed $seed0")
      val gotArms = got.filter(_.getString(0) == "arm")
        .map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
      (0 until 4).foreach { a =>
        assert(gotArms(a.toLong) === ((dp(a), tr(a), sc(a))),
          s"seed $seed0 arm $a")
      }
      // the planted best arm (3) gets the most days once exploration ends
      assert(dp(3) === (0 until 4).map(dp).max, dp.toList.toString)
      // regret row: replay totals are the pick sums; best logged arm is
      // the planted 3; regret = logged best mean − replay mean, exact
      val lg3 = cells.iterator.collect {
        case ((_, 3L), (t, sr)) => (t, sr)
      }.foldLeft((0L, 0L)) { case ((x, y), (t, sr)) => (x + t, y + sr) }
      val reg = got.filter(_.getString(0) == "regret").head
      assert(reg.getLong(2) === 3L, s"seed $seed0: ${reg.toString}")
      assert(reg.getLong(4) === tr.sum && reg.getLong(5) === sc.sum)
      val want = (BigInt(lg3._2) * 1000000L / lg3._1 -
        BigInt(sc.sum) * 1000000L / tt).toLong
      assert(reg.getLong(6) === want, s"seed $seed0")
    }
  }

  test("q353 UCB1 replay starvation guard: an md5 bucket with zero logged traffic is never picked (its arm row reports the −1 sentinel), and an arm whose only traffic precedes its forced turn cannot capture the replay") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byArm = (0L to 3L).map(a =>
      a -> (1L to 400L).filter(armOf(_) == a)).toMap
    assert(byArm.values.forall(_.size >= 3), byArm.view.mapValues(_.size))
    val dayNs = 86400L * 1000000000L
    var eid = 0L
    def ev(day: Int, u: Long, purch: Boolean) = {
      eid += 1
      (eid, day * dayNs, u, if (purch) "purchase" else "view", 1.0, "{}")
    }
    // arm 3's bucket is EMPTY (no events ever); arm 2's only traffic
    // is day 0, where arm 0 (smaller id, also trafficked) wins the
    // forced pick — under the pre-guard rule both would be re-forced
    // forever, allocating every remaining day to a dt = 0 arm
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    (0 until 10).foreach { d =>
      byArm(0L).take(3).foreach(u => rows += ev(d, u, purch = d % 2 == 0))
      byArm(1L).take(3).foreach(u => rows += ev(d, u, purch = true))
    }
    byArm(2L).take(3).foreach(u => rows += ev(0, u, purch = false))
    val dir = java.nio.file.Files
      .createTempDirectory("graftucbstarve").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q353_ucb_replay")(spark, dir).collect()
    val picks = got.filter(_.getString(0) == "pick")
      .sortBy(_.getLong(1))
    assert(picks.length === 10)
    // day 0 forces arm 0; day 1 forces arm 1 (arm 2 has no day-1 cell,
    // arm 3 none ever); every later day is argmax over {0, 1} — arms 2
    // and 3 never appear, and no pick loops on a dead arm
    assert(picks(0).getLong(2) === 0L && picks(0).getLong(4) === 3L)
    assert(picks(1).getLong(2) === 1L && picks(1).getLong(4) === 3L)
    assert(picks.forall(p => p.getLong(2) <= 1L), picks.map(_.getLong(2)).toList)
    // forced picks always absorb traffic (the guard's invariant)
    assert(picks.filter(_.getLong(6) == -1L).forall(_.getLong(4) >= 1L))
    val arms = got.filter(_.getString(0) == "arm")
      .map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4), r.getLong(6)))
      .toMap
    assert(arms(3L) === ((0L, 0L, -1L)), arms(3L)) // empty bucket sentinel
    assert(arms(2L) === ((0L, 0L, -1L)), arms(2L)) // missed-turn arm: never played
    // arm 1 (always-converting) is never starved: it ties for the
    // most allocated days (arm 0 is only ever picked on its
    // converting even days, so both observed means sit at 10⁶ and
    // the UCB tie-break alternates them)
    assert(arms(1L)._1 === (0L to 3L).map(a => arms(a)._1).max)
    // regret row: best logged arm is 1 (mean 10⁶); exact vs replay mean
    val reg = got.filter(_.getString(0) == "regret").head
    assert(reg.getLong(2) === 1L)
    val tt = arms.values.map(_._2).sum
    val ss = got.filter(_.getString(0) == "arm").map(_.getLong(5)).sum
    assert(reg.getLong(6) ===
      (BigInt(1000000L) - BigInt(ss) * 1000000L / tt).toLong)
  }

  test("q355 ARMA(1,1) Hannan-Rissanen: a planted mixed series matches an independent two-stage fixed-point replay exactly, recovers (phi, theta) to sample resolution, and a constant series reports the sentinel") {
    import spark.implicits._
    // x_t = 0.7·x_{t−1} + e_t + 0.5·e_{t−1} — the mixed signature
    // neither q319 (pure AR) nor q351 (pure MA) models
    val A = 500000L
    var seed = 11L
    def lcg(): Long = {
      seed = (seed * 1103515245L + 12345L) % (1L << 31)
      seed % 2001L - 1000L
    }
    var xP = 0.0; var eP = 0.0
    val cents = (0 until 72).map { _ =>
      val e = lcg() * 40.0
      val x = 0.7 * xP + e + 0.5 * eP
      xP = x; eP = e
      A + x.toLong
    }
    val orders = cents.zipWithIndex.map { case (c, t) =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftarma").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // ---- independent replay from the Hannan–Rissanen formulas ----
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b
    val n = cents.length
    val mu = tdiv(cents.map(BigInt(_)).sum, n).toLong
    val dv = cents.map(_ - mu)
    val den = dv.map(x => BigInt(x) * x).sum
    val rho = (1 to 12).map { k =>
      tdiv((0 until n - k).map(t => BigInt(dv(t)) * dv(t + k)).sum
        * 1000000, den).toLong
    }
    var phiR = Vector(BigInt(rho(0)))
    var v = BigInt(1000000L) - BigInt(rho(0)) * rho(0) / 1000000L
    var k = 1
    while (k < rho.length && v > 0) {
      val num = BigInt(rho(k)) * 1000000L -
        (1 to k).map(j => phiR(j - 1) * rho(k - j)).sum
      val pk = tdiv(num, v)
      phiR = (1 to k).map(j => phiR(j - 1) -
        tdiv(pk * phiR(k - j), 1000000L)).toVector :+ pk
      v = tdiv(v * (1000000L - tdiv(pk * pk, 1000000L)), 1000000L)
      k += 1
    }
    val h = k
    assert(h === 12, s"full DL depth expected, got $h")
    val mx = dv.map(x => BigInt(x).abs).max
    val ds = dv.map(x => tdiv(BigInt(x) * 10000L, mx).toLong)
    val eh = new Array[Long](n)
    (h until n).foreach { t =>
      eh(t) = ds(t) - tdiv((1 to h).map(j => phiR(j - 1) * ds(t - j)).sum,
        BigInt(1000000L)).toLong
    }
    val ts2 = (h + 1) until n
    val m = BigInt(ts2.size)
    def bs(f: Int => BigInt) = ts2.map(f).sum
    val (s1v, s2v, syv) = (bs(t => BigInt(ds(t - 1))),
      bs(t => BigInt(eh(t - 1))), bs(t => BigInt(ds(t))))
    val s11 = bs(t => BigInt(ds(t - 1)) * ds(t - 1))
    val s12 = bs(t => BigInt(ds(t - 1)) * eh(t - 1))
    val s22 = bs(t => BigInt(eh(t - 1)) * eh(t - 1))
    val s1y = bs(t => BigInt(ds(t - 1)) * ds(t))
    val s2y = bs(t => BigInt(eh(t - 1)) * ds(t))
    def det3(a: BigInt, b: BigInt, c: BigInt, d: BigInt, e: BigInt,
        f: BigInt, g: BigInt, hh: BigInt, i: BigInt): BigInt =
      a * (e * i - f * hh) - b * (d * i - f * g) + c * (d * hh - e * g)
    val dA = det3(m, s1v, s2v, s1v, s11, s12, s2v, s12, s22)
    val cE = tdiv(det3(syv, s1v, s2v, s1y, s11, s12, s2y, s12, s22)
      * 1000000L, dA).toLong
    val phiE = tdiv(det3(m, syv, s2v, s1v, s1y, s12, s2v, s2y, s22)
      * 1000000L, dA).toLong
    val thetaE = tdiv(det3(m, s1v, syv, s1v, s11, s1y, s2v, s12, s2y)
      * 1000000L, dA).toLong
    // the planted (0.7, 0.5) recovered to two-stage sample resolution
    assert(math.abs(phiE - 700000L) < 150000L, s"phi $phiE")
    assert(math.abs(thetaE - 500000L) < 200000L, s"theta $thetaE")

    val got = SparkEntry.queries("q355_arma_forecast")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.collect { case ("order", _, _, hv, _) => hv }.toList
      === List(12L))
    assert(got.collect { case ("coef", j, _, cv, _) => (j, cv) }.toList
      === List((0L, cE), (1L, phiE), (2L, thetaE)),
      "coefficients must equal the independent replay exactly (ppm)")
    def predN(dP: Long, eP2: Long): Long =
      tdiv(BigInt(cE) + BigInt(phiE) * dP + BigInt(thetaE) * eP2,
        BigInt(1000000L)).toLong
    def toC(pn: BigInt): Long = mu + tdiv(pn * mx, BigInt(10000L)).toLong
    val wantF = ts2.map { t =>
      val f = toC(BigInt(predN(ds(t - 1), eh(t - 1))))
      (t.toLong, cents(t), f, math.abs(cents(t) - f))
    }
    assert(got.collect { case ("forecast", mm, a, f, e) => (mm, a, f, e) }
      .toList === wantF.toList)
    var dh = BigInt(predN(ds(n - 1), eh(n - 1)))
    val wantH = (1 to 3).map { kk =>
      if (kk > 1) dh = tdiv(BigInt(cE) + BigInt(phiE) * dh, BigInt(1000000L))
      ((n + kk - 1).toLong, toC(dh))
    }
    val gotH = got.collect { case ("horizon", mm, _, f, _) => (mm, f) }
    assert(gotH.toList === wantH.toList)
    // the mixed signature: the horizon is NOT flat after one step (an
    // MA(1) tail is) — the AR term keeps recursing
    assert(gotH(1)._2 !== gotH(2)._2, gotH.toList.toString)

    // the panel closes the Box–Jenkins loop: the ARMA column exists
    // in the q306 backtest and WINS on a planted ARMA(1,1) — the
    // margin over the deep band-selected AR/MA fits is honest but
    // thin (the in-sample panel lets them spend up to 12 parameters
    // against ARMA's 3), so the fixture pins a deterministic seed
    // where the exact parametrization beats both (arma 21100 vs
    // ar 21348 / ma 22067 cents MAE); everything is exact integer
    // arithmetic, so the ranking is bit-reproducible
    var seed2 = 123L
    def lcg2(): Long = {
      seed2 = (seed2 * 1103515245L + 12345L) % (1L << 31)
      seed2 % 2001L - 1000L
    }
    var xP2 = 0.0; var eP3 = 0.0
    val cents2 = (0 until 72).map { _ =>
      val e = lcg2() * 40.0
      val x = 0.45 * xP2 + e + 0.4 * eP3
      xP2 = x; eP3 = e
      A + x.toLong
    }
    val dir2 = java.nio.file.Files.createTempDirectory("graftarmap")
      .toString
    cents2.zipWithIndex.map { case (c, t) =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir2/orders.parquet")
    val bt = SparkEntry.queries("q306_forecast_backtest")(spark, dir2)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(bt.contains("arma"), bt.toString)
    assert(bt("arma")._1 >= 0L, bt.toString)
    assert(bt("arma")._2, s"arma must win on the planted ARMA(1,1): $bt")

    // constant series: no ACF exists — the loud 4-row sentinel
    val flatDir = java.nio.file.Files.createTempDirectory("graftarmaf")
      .toString
    (0 until 12).map(t =>
        (t.toLong, f"2020-${t + 1}%02d-01", 100.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$flatDir/orders.parquet")
    val flat = SparkEntry.queries("q355_arma_forecast")(spark, flatDir)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(flat.toList === List(("coef", -1L), ("coef", -1L),
      ("coef", -1L), ("order", 0L)), flat.toList.toString)
  }

  test("q323 Ljung-Box: the planted AR(2)'s raw series is loudly correlated, the fit's residuals pass white — the estimation stage earns its keep") {
    import spark.implicits._
    // the same LCG AR(2) fixture as the q319 spec
    val A = 500000L
    var seed = 42L
    def lcg(): Long = {
      seed = (seed * 1103515245L + 12345L) % (1L << 31)
      seed % 2001L - 1000L
    }
    var x1 = 0.0; var x2 = 0.0
    val cents = (0 until 60).map { _ =>
      val x = 1.1 * x1 - 0.5 * x2 + lcg() * 40.0
      x2 = x1; x1 = x
      A + x.toLong
    }
    val orders = cents.zipWithIndex.map { case (c, t) =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftlb").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q323_ljung_box")(spark, dir).head()
    // pinned against two independent replays (python fixed-point and the
    // DuckDB recursive CTE agreed on these literals): 58 residuals after
    // the AR(2) fit, Q = 17.0 < chi2(10) = 18.3 -> the fit extracted the
    // structure and its residuals test white
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getString(5)) ===
      ((58L, 2L, 12L, 16998236L, 18307038L, "white")), r.toString)
    // the CONTRAST: the same Ljung-Box form on the RAW series' ACF
    // (q307's output, the p = 0 "no model" reading) rejects loudly —
    // without the estimation stage the series is anything but white
    val acf = SparkEntry.queries("q307_acf")(spark, dir).collect()
      .map(x => x.getAs[Long]("acf_ppm"))
    val n = 60
    val qRaw = (BigInt(n) * (n + 2) * acf.zipWithIndex.map { case (a, i) =>
      BigInt(a) * a / (n - (i + 1))
    }.sum / 1000000L).toLong
    assert(qRaw > graft.operators.Stats.chi2Crit95Micro(12),
      s"raw-series Q $qRaw must reject")
  }

  test("q324 classical decomposition: a planted trend+seasonal series decomposes EXACTLY — trend A+Bm, seasonal S, remainder zero") {
    import spark.implicits._
    // q303's fixture: cents = A + B·m + S[m % 12], ΣS = 0. The centered
    // 12-MA of a linear+zero-sum-seasonal series is the line itself
    // (both off-by-one windows sum to 12A + B(12m ∓ 6); their mean is
    // exactly A + Bm, integer-exact since 24 | 24A + 24Bm), so the
    // detrended series IS S, the per-position means are S, the
    // centering adjustment is 0, and every remainder vanishes
    val S = Vector(600L, -600L, 300L, -300L, 120L, -120L,
      60L, -60L, 24L, -24L, 0L, 0L)
    val A = 1000000L; val B = 2L
    val orders = (0 until 30).map { t =>
      (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01",
        (A + B * t + S(t % 12)) / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftcd").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q324_classical_decomp")(spark, dir)
      .orderBy("m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val want = (6 until 24).map { m =>
      (m.toLong, A + B * m + S(m % 12), A + B * m, S(m % 12), 0L)
    }
    assert(got.toList === want.toList, got.take(4).mkString(","))
    // under 13 months the centered MA is undefined everywhere — loud
    val shortDir = java.nio.file.Files.createTempDirectory("graftcds").toString
    orders.limit(12).write.mode("overwrite").parquet(s"$shortDir/orders.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q324_classical_decomp")(spark, shortDir).collect()
    }
    assert(e.getMessage.contains("q324"))
  }

  test("q325 Mann-Kendall: a strict ramp is significant with the hand-derived S and z; a constant series is a zero-variance non-trend") {
    import spark.implicits._
    def fixture(cents: Seq[Long], tag: String): String = {
      val orders = cents.zipWithIndex.map { case (c, t) =>
        (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
      }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    // strict ramp, n = 30: every pair concordant, S = n(n−1)/2 = 435,
    // no ties so 18·Var = n(n−1)(2n+5) = 56550; z = 434/√3141.67 ≈ 7.74
    val up = SparkEntry.queries("q325_mann_kendall")(
      spark, fixture((0 until 30).map(t => 1000000L + 100L * t), "graftmku"))
      .head()
    assert(up.getAs[Long]("n_months") === 30L)
    assert(up.getAs[Long]("s_stat") === 435L)
    assert(up.getAs[Long]("var18") === 56550L)
    val expZ = graft.operators.Stats.isqrt(
      BigInt(434) * 434 * 18 * BigInt("1000000000000") / 56550).toLong
    assert(up.getAs[Long]("z_micro") === expZ, up.toString)
    assert(expZ > 7000000L && expZ < 8000000L, expZ.toString)
    assert(up.getAs[Boolean]("significant"))
    // constant series: S = 0 and the single n-sized tie group cancels
    // the variance term entirely — the honest "nothing to test" row
    val flat = SparkEntry.queries("q325_mann_kendall")(
      spark, fixture(Seq.fill(30)(1000000L), "graftmkf")).head()
    assert(flat.getAs[Long]("s_stat") === 0L)
    assert(flat.getAs[Long]("var18") === 0L)
    assert(flat.getAs[Long]("z_micro") === 0L)
    assert(!flat.getAs[Boolean]("significant"))
  }

  test("q326 changepoint: a planted step locates the exact break with full explained variance; a constant series reports zero gain") {
    import spark.implicits._
    def fixture(cents: Seq[Long], tag: String): String = {
      val orders = cents.zipWithIndex.map { case (c, t) =>
        (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01", c / 100.0)
      }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    // 20 months at A then 20 at A+D: within-segment variance is zero,
    // so the k = 20 split explains ALL variance — gain exactly 10⁶ —
    // and both segment means are the planted levels
    val A = 1000000L; val D = 44400L
    val step = SparkEntry.queries("q326_changepoint")(spark,
      fixture((0 until 40).map(t => if (t < 20) A else A + D), "graftcp"))
      .head()
    assert((step.getLong(0), step.getLong(1), step.getLong(2),
      step.getLong(3), step.getLong(4)) ===
      ((40L, 20L, A * 1000000L, (A + D) * 1000000L, 1000000L)),
      step.toString)
    // constant series: every split explains nothing; tie → smallest k
    val flat = SparkEntry.queries("q326_changepoint")(spark,
      fixture(Seq.fill(24)(A), "graftcpf")).head()
    assert((flat.getLong(1), flat.getLong(4)) === ((1L, 0L)), flat.toString)
  }

  test("q327 strengths: the exact trend+seasonal fixture scores 10⁶ on both; a pure trend scores (10⁶, 0)") {
    import spark.implicits._
    def fixture(s: Vector[Long], tag: String): String = {
      val A = 1000000L; val B = 2L
      val orders = (0 until 30).map { t =>
        (t.toLong, f"${2020 + t / 12}-${t % 12 + 1}%02d-01",
          (A + B * t + s(t % 12)) / 100.0)
      }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    // q324's exact fixture: remainder ≡ 0, so Var(R) = 0 against
    // nonzero Var(T+R) and Var(S+R) — both strengths saturate at 10⁶
    val S = Vector(600L, -600L, 300L, -300L, 120L, -120L,
      60L, -60L, 24L, -24L, 0L, 0L)
    val both = SparkEntry.queries("q327_strength_measures")(
      spark, fixture(S, "graftst")).head()
    assert((both.getLong(1), both.getLong(2)) === ((1000000L, 1000000L)),
      both.toString)
    // zero seasonal: S+R is identically zero → the defined 0 floor,
    // while the pure line still saturates the trend measure
    val line = SparkEntry.queries("q327_strength_measures")(
      spark, fixture(Vector.fill(12)(0L), "graftstl")).head()
    assert((line.getLong(1), line.getLong(2)) === ((1000000L, 0L)),
      line.toString)
  }

  test("q328 Poisson bootstrap: a constant corpus collapses the interval to the point mean exactly; a two-level corpus brackets it at ~sd/√n") {
    import spark.implicits._
    def fixture(cents: Seq[Long], tag: String): String = {
      val orders = cents.zipWithIndex.map { case (c, t) =>
        (t.toLong, "2020-01-01", c / 100.0)
      }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    // every weighted mean of a constant IS the constant — the interval
    // degenerates to the point estimate with zero width, exactly
    val const = SparkEntry.queries("q328_poisson_bootstrap")(
      spark, fixture(Seq.fill(500)(123456L), "graftbc")).head()
    assert(const.getAs[Long]("mean_micro") === 123456000000L, const.toString)
    assert(const.getAs[Long]("ci_lo_micro") === 123456000000L, const.toString)
    assert(const.getAs[Long]("ci_hi_micro") === 123456000000L, const.toString)
    // alternating 100.00/300.00 over 1000 orders: mean 200.00, sd 100,
    // so the 95% band sits ~±2·100/√1000 ≈ ±6.3 around the mean — the
    // deterministic draws put both ends strictly inside ±15 and the
    // interval strictly brackets the mean
    val two = SparkEntry.queries("q328_poisson_bootstrap")(
      spark, fixture((0 until 1000).map(t =>
        if (t % 2 == 0) 10000L else 30000L), "graftb2")).head()
    val (m, lo, hi) = (two.getAs[Long]("mean_micro"),
      two.getAs[Long]("ci_lo_micro"), two.getAs[Long]("ci_hi_micro"))
    assert(m === 20000000000L, two.toString)
    assert(lo < m && m < hi, two.toString)
    assert(m - lo < 1500000000L && hi - m < 1500000000L, two.toString)
  }

  test("q322 power/MDE: planted two-arm fixture matches the hand-computed closed forms exactly") {
    import spark.implicits._
    // fixture prep: derive each candidate user's md5 arm (assignment is
    // fixture plumbing, not the formula under test), take 10 users per
    // arm, and plant per-user POST-period purchase counts with clean
    // moments — arm 0: five 1s + five 3s (μ=2, σ²=1); arm 1: five 2s +
    // five 6s (μ=4, σ²=4)
    val armOf = (1L to 60L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val arm0 = (1L to 60L).filter(armOf(_) == 0L).take(10)
    val arm1 = (1L to 60L).filter(armOf(_) == 1L).take(10)
    assert(arm0.size === 10 && arm1.size === 10)
    val dayNs = 86400L * 1000000000L
    def yOf(i: Int, lo: Long, hi: Long) = if (i % 2 == 0) lo else hi
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    // every user views on day 0 (pre-split anchor) and on day 29 (so the
    // split lands mid-window at day 15); purchases on day 20 (post)
    (arm0 ++ arm1).foreach { u =>
      eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
      eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
    }
    arm0.zipWithIndex.foreach { case (u, i) =>
      (1L to yOf(i, 1L, 3L)).foreach { _ =>
        eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
      }
    }
    arm1.zipWithIndex.foreach { case (u, i) =>
      (1L to yOf(i, 2L, 6L)).foreach { _ =>
        eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graftpow").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q322_power_mde")(spark, dir).head()
    // hand numbers: z = 2.801585 micro-summed; MDE = z·√(1/10 + 4/10)
    //             = 2.801585·0.7071… = 1.981020 y → 1981019 micro
    // (exact: isqrt(2801585²·5·10¹¹) = 1981019751570, div 10⁶);
    // target δ = 5% of μ₀ = 0.1 y; required n = ⌈z²·(1+4)/0.1²⌉
    //          = ⌈3924.4⌉ = 3925; observed Δ = 2 y ≥ MDE → detectable
    assert(r.getAs[Long]("n_control") === 10L, r.toString)
    assert(r.getAs[Long]("n_treat") === 10L, r.toString)
    assert(r.getAs[Long]("mean_control_micro") === 2000000L, r.toString)
    assert(r.getAs[Long]("mean_treat_micro") === 4000000L, r.toString)
    assert(r.getAs[Long]("delta_micro") === 2000000L, r.toString)
    assert(r.getAs[Long]("mde_micro") === 1981019L, r.toString)
    assert(r.getAs[Long]("target_delta_micro") === 100000L, r.toString)
    assert(r.getAs[Long]("n_required_per_arm") === 3925L, r.toString)
    assert(r.getAs[Boolean]("detectable"), r.toString)
    // the exact-isqrt contract the oracle's corrected double sqrt must
    // match: floor roots of the planted radicand and its neighbors
    assert(graft.operators.Stats.isqrt(BigInt("3924439256112500000000000"))
      === BigInt("1981019751570"))
    assert(graft.operators.Stats.isqrt(BigInt(0)) === BigInt(0))
    assert(graft.operators.Stats.isqrt(BigInt(15)) === BigInt(3))
    assert(graft.operators.Stats.isqrt(BigInt(16)) === BigInt(4))
  }

  test("q329 Mann-Whitney: planted arm distributions reproduce the hand-computed doubled ranks, tie-corrected z, and verdicts exactly") {
    import spark.implicits._
    // fixture plumbing shared with q322's spec: derive md5 arms, plant
    // per-user POST-period purchase counts (views on day 0 and 29 anchor
    // the midpoint split at day 15; purchases land on day 20)
    val armOf = (1L to 200L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fixture(vals0: Seq[Long], vals1: Seq[Long], tag: String): String = {
      val arm0 = (1L to 200L).filter(armOf(_) == 0L).take(vals0.size)
      val arm1 = (1L to 200L).filter(armOf(_) == 1L).take(vals1.size)
      assert(arm0.size == vals0.size && arm1.size == vals1.size)
      val dayNs = 86400L * 1000000000L
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      (arm0 ++ arm1).foreach { u =>
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
      }
      (arm0.zip(vals0) ++ arm1.zip(vals1)).foreach { case (u, y) =>
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q329_mann_whitney")(spark, dir).head()
    // complete separation, 10v10 with four 5-way tie groups:
    // pooled ranks avg 3/8/13/18 → R₁ = 5·13+5·18 = 155, 2U₁ = 310−110
    // = 200 (every arm1 value beats every arm0 value: U₁ = n₀n₁ = 100);
    // T = 4·(125−5) = 480, tcorr = 480e6//380 = 1263157,
    // var12 = 100·(21e6−1263157) = 1973684300, isqrt = 44426,
    // z = 100·1732050807//44426 = 3898732 > 1959964 → significant
    val sep = run(fixture(Seq.fill(5)(1L) ++ Seq.fill(5)(3L),
      Seq.fill(5)(6L) ++ Seq.fill(5)(8L), "graftmwu1"))
    assert(sep.getAs[Long]("n_control") === 10L, sep.toString)
    assert(sep.getAs[Long]("n_treat") === 10L, sep.toString)
    assert(sep.getAs[Long]("u1_x2") === 200L, sep.toString)
    assert(sep.getAs[Long]("mu_x2") === 100L, sep.toString)
    assert(sep.getAs[Long]("z_micro") === 3898732L, sep.toString)
    assert(sep.getAs[Boolean]("significant"), sep.toString)
    // interleaved: arm1 {2×5, 6×5} vs arm0 {1×5, 3×5} → R₁ = 5·8+5·18
    // = 130, 2U₁ = 150, z = 50·1732050807//44426 = 1949366 — just UNDER
    // the 1959964 critical: the tie-corrected borderline verdict
    val mid = run(fixture(Seq.fill(5)(1L) ++ Seq.fill(5)(3L),
      Seq.fill(5)(2L) ++ Seq.fill(5)(6L), "graftmwu2"))
    assert(mid.getAs[Long]("u1_x2") === 150L, mid.toString)
    assert(mid.getAs[Long]("z_micro") === 1949366L, mid.toString)
    assert(!mid.getAs[Boolean]("significant"), mid.toString)
    // identical distributions: 2U₁ lands exactly on 2μ_U and z = 0
    val same = run(fixture(Seq(1L, 2L, 3L, 4L, 5L),
      Seq(1L, 2L, 3L, 4L, 5L), "graftmwu3"))
    assert(same.getAs[Long]("u1_x2") === same.getAs[Long]("mu_x2"),
      same.toString)
    assert(same.getAs[Long]("z_micro") === 0L, same.toString)
    assert(!same.getAs[Boolean]("significant"), same.toString)
  }

  test("q331 SRM: a day with broken bucketing flags while the balanced lifetime ALL row stays green — hand-computed chi-squares exactly") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a0 = (1L to 400L).filter(armOf(_) == 0L)
    val a1 = (1L to 400L).filter(armOf(_) == 1L)
    val dayNs = 86400L * 1000000000L
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    def seen(u: Long, day: Long): Unit = {
      eid += 1; rows += ((eid, day * dayNs, u, "view", 1.0, "{}"))
    }
    // day 0: 5 control + 12 treat; day 1: 8 control + 1 treat
    a0.take(5).foreach(seen(_, 0L)); a1.take(12).foreach(seen(_, 0L))
    a0.slice(5, 13).foreach(seen(_, 1L)); a1.slice(12, 13).foreach(seen(_, 1L))
    // later repeat events must NOT move anyone's assignment day
    a0.take(3).foreach(seen(_, 5L)); a1.take(3).foreach(seen(_, 5L))
    val dir = java.nio.file.Files.createTempDirectory("graftsrm").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q331_srm_audit")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // day 0: (5−12)²·1e6/17 = 2882352 < crit → green
    // day 1: (8−1)²·1e6/9 = 5444444 > crit → SRM (the broken deploy day)
    // ALL: 13 vs 13 → 0 — the lifetime total hides the breakage
    assert(got.length === 3, got.mkString(";"))
    assert(got(0)._1.endsWith("-01") || got(0)._1 < got(1)._1)
    assert(got(0) === ((got(0)._1, 5L, 12L, 2882352L, false)), got(0).toString)
    assert(got(1)._2 === 8L && got(1)._3 === 1L &&
      got(1)._4 === 5444444L && got(1)._5, got(1).toString)
    assert(got(2) === (("ALL", 13L, 13L, 0L, false)), got(2).toString)
  }

  test("q332 delta-method ratio: planted per-user frames give exact ppm ratios/SEs, the zero-variance sentinel, and a borderline z verdict") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-user (clicks, purchases) per arm
    def fixture(u0: Seq[(Long, Long)], u1: Seq[(Long, Long)],
        tag: String): String = {
      val a0 = (1L to 400L).filter(armOf(_) == 0L).take(u0.size)
      val a1 = (1L to 400L).filter(armOf(_) == 1L).take(u1.size)
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      (a0.zip(u0) ++ a1.zip(u1)).foreach { case (u, (cl, pu)) =>
        (1L to cl).foreach { _ =>
          eid += 1; rows += ((eid, 0L, u, "click", 1.0, "{}"))
        }
        (1L to pu).foreach { _ =>
          eid += 1; rows += ((eid, 86400L * 1000000000L, u, "purchase",
            1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q332_delta_ratio")(spark, dir).head()
    // identical users in both arms: every central moment is 0 → SE 0,
    // pooled variance 0 → the z sentinel (-1), never a division
    val const = run(fixture(Seq.fill(4)((2L, 1L)), Seq.fill(4)((2L, 2L)),
      "graftdr1"))
    assert(const.getAs[Long]("ratio_control_ppm") === 500000L, const.toString)
    assert(const.getAs[Long]("ratio_treat_ppm") === 1000000L, const.toString)
    assert(const.getAs[Long]("se_control_ppm") === 0L, const.toString)
    assert(const.getAs[Long]("se_treat_ppm") === 0L, const.toString)
    assert(const.getAs[Long]("z_micro") === -1L, const.toString)
    assert(!const.getAs[Boolean]("significant"), const.toString)
    // treat arm (1,2)×2 + (3,2)×2: Sx=8 Sy=8 → ratio 1e6; only σ²_x is
    // nonzero (1e6 micro), so var·1e12 = (r²σ²_x/1e12)·1e18/(n·µ²_x)
    // = 1e6·1e18/(4·4e12) = 6.25e10 → SE = 250000 ppm exactly; control
    // (2,1)×4 → ratio 500000, SE 0. diff 500000, z = 500000·1e6/250000
    // = 2000000 — just past 1959964 → significant
    val sep = run(fixture(Seq.fill(4)((2L, 1L)),
      Seq((1L, 2L), (1L, 2L), (3L, 2L), (3L, 2L)), "graftdr2"))
    assert(sep.getAs[Long]("n_control") === 4L, sep.toString)
    assert(sep.getAs[Long]("n_treat") === 4L, sep.toString)
    assert(sep.getAs[Long]("ratio_control_ppm") === 500000L, sep.toString)
    assert(sep.getAs[Long]("ratio_treat_ppm") === 1000000L, sep.toString)
    assert(sep.getAs[Long]("se_control_ppm") === 0L, sep.toString)
    assert(sep.getAs[Long]("se_treat_ppm") === 250000L, sep.toString)
    assert(sep.getAs[Long]("diff_ppm") === 500000L, sep.toString)
    assert(sep.getAs[Long]("z_micro") === 2000000L, sep.toString)
    assert(sep.getAs[Boolean]("significant"), sep.toString)
  }

  test("q333 BH-FDR: the step-up property rejects a rank that fails its own threshold when a later rank passes") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a0 = (1L to 400L).filter(armOf(_) == 0L).take(40)
    val a1 = (1L to 400L).filter(armOf(_) == 1L).take(40)
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    def conv(users: Seq[Long], t: String): Unit = users.foreach { u =>
      eid += 1; rows += ((eid, 0L, u, t, 1.0, "{}"))
    }
    // every user views (zero-margin χ² guard → 0); per-type (treat,
    // control) conversions: click (35,5) χ² 45000000, error (30,11)
    // 18061288, purchase = signup (20,11) 4265964 — BETWEEN crit₄
    // 4217885 and crit₃ 4709292, so rank 3 fails its own threshold but
    // rank 4 passes → k = 4: BH's step-up rejects rank 3 anyway
    conv(a0 ++ a1, "view")
    conv(a1.take(35) ++ a0.take(5), "click")
    conv(a1.take(30) ++ a0.take(11), "error")
    conv(a1.take(20) ++ a0.take(11), "purchase")
    conv(a1.take(20) ++ a0.take(11), "signup")
    val dir = java.nio.file.Files.createTempDirectory("graftbh").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q333_bh_fdr")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("chi2_micro"),
        r.getAs[Int]("rank"), r.getAs[Long]("crit_micro"),
        r.getAs[Boolean]("rejected")))
    assert(got.toList === List(
      ("click", 45000000L, 1, 6634897L, true),
      ("error", 18061288L, 2, 5411894L, true),
      ("purchase", 4265964L, 3, 4709292L, true), // the step-up rescue
      ("signup", 4265964L, 4, 4217885L, true),
      ("view", 0L, 5, 3841459L, false)), got.mkString("\n"))
  }

  test("q333 BH-FDR: complete separation (zero control conversions, all margins nonzero) computes the χ² and rejects — only zero MARGINS guard to 0") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a0 = (1L to 400L).filter(armOf(_) == 0L).take(40)
    val a1 = (1L to 400L).filter(armOf(_) == 1L).take(40)
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    def conv(users: Seq[Long], t: String): Unit = users.foreach { u =>
      eid += 1; rows += ((eid, 0L, u, t, 1.0, "{}"))
    }
    // every user views (the arm-total denominator); click converts in
    // TREATMENT ONLY — the strongest possible 2×2 signal; the old
    // any-zero-CELL guard zeroed it and never rejected
    conv(a0 ++ a1, "view")
    conv(a1.take(30), "click")
    val dir = java.nio.file.Files.createTempDirectory("graftbhs").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q333_bh_fdr")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("chi2_micro"), r.getAs[Int]("rank"),
          r.getAs[Boolean]("rejected"))).toMap
    // exact replay of the margin-guarded integer χ²: n1 = n0 = 40,
    // a = 30, c = 0 → 80·(30·40)²·10⁶ div (40·40·30·50)
    val (n1, n0, a, c) = (40L, 40L, 30L, 0L)
    val det = BigInt(a) * (n0 - c) - BigInt(n1 - a) * c
    val expect = (BigInt(n0 + n1) * det * det * 1000000L /
      (BigInt(n1) * n0 * (a + c) * ((n1 - a) + (n0 - c)))).toLong
    assert(expect === 48000000L)
    assert(got("click") === ((expect, 1, true)), got.toString)
    assert(got("view")._1 === 0L, "all-converter view: zero margin → 0")
  }

  test("q335 winsorized mean: the pooled p99 cap neutralizes a planted whale; an uncapped spread fixture gives the exact hand-computed z") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fixture(vals0: Seq[Long], vals1: Seq[Long], tag: String): String = {
      val a0 = (1L to 400L).filter(armOf(_) == 0L).take(vals0.size)
      val a1 = (1L to 400L).filter(armOf(_) == 1L).take(vals1.size)
      assert(a0.size == vals0.size && a1.size == vals1.size)
      val dayNs = 86400L * 1000000000L
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      (a0.zip(vals0) ++ a1.zip(vals1)).foreach { case (u, y) =>
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q335_winsorized_mean")(spark, dir).head()
    // whale: 50×1 control vs 49×1 + one y=1000 treat. N=100 → nearest
    // rank 99 → cap = 1: the whale caps to 1, both capped means are
    // EXACTLY 10⁶, capped variance 0 → the z sentinel; the capped-share
    // row exposes the whale (1/50 = 20000 ppm)
    val whale = run(fixture(Seq.fill(50)(1L),
      Seq.fill(49)(1L) :+ 1000L, "graftwin1"))
    assert(whale.getAs[Long]("cap_value") === 1L, whale.toString)
    assert(whale.getAs[Long]("mean_control_micro") === 1000000L, whale.toString)
    assert(whale.getAs[Long]("mean_treat_micro") === 1000000L, whale.toString)
    assert(whale.getAs[Long]("capped_control_ppm") === 0L, whale.toString)
    assert(whale.getAs[Long]("capped_treat_ppm") === 20000L, whale.toString)
    assert(whale.getAs[Long]("z_micro") === -1L, whale.toString)
    assert(!whale.getAs[Boolean]("significant"), whale.toString)
    // spread: control 25×1 + 25×3 (µ=2, σ²=1), treat 25×2 + 25×6 (µ=4,
    // σ²=4); cap = p99 = 6 caps nothing. vm = σ²·10¹²/50 → vsum 10¹¹,
    // isqrt 316227, z = 2·10¹²//316227 = 6324570 → significant
    val spread = run(fixture(
      Seq.fill(25)(1L) ++ Seq.fill(25)(3L),
      Seq.fill(25)(2L) ++ Seq.fill(25)(6L), "graftwin2"))
    assert(spread.getAs[Long]("cap_value") === 6L, spread.toString)
    assert(spread.getAs[Long]("mean_control_micro") === 2000000L, spread.toString)
    assert(spread.getAs[Long]("mean_treat_micro") === 4000000L, spread.toString)
    assert(spread.getAs[Long]("capped_control_ppm") === 0L, spread.toString)
    assert(spread.getAs[Long]("capped_treat_ppm") === 0L, spread.toString)
    assert(spread.getAs[Long]("z_micro") === 6324570L, spread.toString)
    assert(spread.getAs[Boolean]("significant"), spread.toString)
  }

  test("q336 jackknife ratio: identical users give zero SE and the z sentinel; a mixed fixture matches an independent delete-one replay exactly") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketOf = (1L to 400L).toDF("user_id")
      .withColumn("b", graft.functions.Hashing.md5Bucket(col("user_id"), 32))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def fixture(u0: Seq[(Long, Long)], u1: Seq[(Long, Long)], tag: String)
        : (String, Seq[(Long, Long, Long)], Seq[(Long, Long, Long)]) = {
      val a0 = (1L to 400L).filter(armOf(_) == 0L).take(u0.size)
      val a1 = (1L to 400L).filter(armOf(_) == 1L).take(u1.size)
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      def emit(u: Long, cl: Long, pu: Long): Unit = {
        (1L to cl).foreach { _ =>
          eid += 1; rows += ((eid, 0L, u, "click", 1.0, "{}"))
        }
        (1L to pu).foreach { _ =>
          eid += 1; rows += ((eid, 0L, u, "purchase", 1.0, "{}"))
        }
      }
      a0.zip(u0).foreach { case (u, (c, p)) => emit(u, c, p) }
      a1.zip(u1).foreach { case (u, (c, p)) => emit(u, c, p) }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      (dir,
        a0.zip(u0).map { case (u, (c, p)) => (bucketOf(u), c, p) },
        a1.zip(u1).map { case (u, (c, p)) => (bucketOf(u), c, p) })
    }
    // independent replay of the delete-one algebra from the raw plants
    def replay(users: Seq[(Long, Long, Long)]): (Long, Long, Option[BigInt]) = {
      val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
      val byB = users.groupBy(_._1).view.mapValues(us =>
        (us.map(_._2).sum, us.map(_._3).sum)).toMap
      val r = BigInt(sy) * 1000000L / sx
      val th = byB.values.toSeq.flatMap { case (bx, by) =>
        if (sx - bx <= 0) None else Some(BigInt(sy - by) * 1000000L / (sx - bx))
      }
      if (th.size < 2) (users.size.toLong, r.toLong, None)
      else {
        val m = th.sum / th.size
        val d2 = th.map(t => (t - m) * (t - m)).sum
        (users.size.toLong, r.toLong, Some(BigInt(th.size - 1) * d2 / th.size))
      }
    }
    def run(dir: String) =
      SparkEntry.queries("q336_jackknife_ratio")(spark, dir).head()
    // identical users: every delete-one ratio equals the full ratio
    val (d1, _, _) = fixture(Seq.fill(12)((2L, 1L)), Seq.fill(12)((2L, 2L)),
      "graftjk1")
    val const = run(d1)
    assert(const.getAs[Long]("ratio_control_ppm") === 500000L, const.toString)
    assert(const.getAs[Long]("ratio_treat_ppm") === 1000000L, const.toString)
    assert(const.getAs[Long]("jk_se_control_ppm") === 0L, const.toString)
    assert(const.getAs[Long]("jk_se_treat_ppm") === 0L, const.toString)
    assert(const.getAs[Long]("z_micro") === -1L, const.toString)
    assert(!const.getAs[Boolean]("significant"), const.toString)
    // mixed fixture: every output column must equal the replay
    val (d2, p0, p1) = fixture(Seq.fill(12)((2L, 1L)),
      (1 to 6).map(_ => (1L, 2L)) ++ (1 to 6).map(_ => (3L, 2L)), "graftjk2")
    val got = run(d2)
    val (n0, r0, v0) = replay(p0)
    val (n1, r1, v1) = replay(p1)
    assert(got.getAs[Long]("n_control") === n0)
    assert(got.getAs[Long]("n_treat") === n1)
    assert(got.getAs[Long]("ratio_control_ppm") === r0, got.toString)
    assert(got.getAs[Long]("ratio_treat_ppm") === r1, got.toString)
    assert(got.getAs[Long]("jk_se_control_ppm") ===
      v0.map(graft.operators.Stats.isqrt(_).toLong).getOrElse(-1L))
    assert(got.getAs[Long]("jk_se_treat_ppm") ===
      v1.map(graft.operators.Stats.isqrt(_).toLong).getOrElse(-1L))
    val expZ = (for { a <- v0; b <- v1 if a + b > 0 } yield
      (BigInt((r1 - r0).abs) * 1000000L /
        graft.operators.Stats.isqrt(a + b)).toLong).getOrElse(-1L)
    assert(got.getAs[Long]("z_micro") === expZ, got.toString)
  }

  test("q337 OBF sequential: a late-breaking effect passes the early steep boundaries untouched and stops exactly at the final look") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dayNs = 86400L * 1000000000L
    def fixture(vals0: Seq[Long], vals1: Seq[Long], pday: Long,
        tag: String): String = {
      val a0 = (1L to 400L).filter(armOf(_) == 0L).take(vals0.size)
      val a1 = (1L to 400L).filter(armOf(_) == 1L).take(vals1.size)
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      (a0.zip(vals0) ++ a1.zip(vals1)).foreach { case (u, y) =>
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 49L * dayNs, u, "view", 1.0, "{}"))
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, pday * dayNs, u, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // purchases on day 45 — the last calendar block of the 50-day span
    // (cuts at days 9/19/29/39/49): looks 1–4 see all-zero metrics
    // (variance 0 → the −1 sentinel), look 5 sees the q322 moments
    // (µ 2 vs 4, σ² 1 vs 4, n 10/arm) → z = 2828430 ≥ 2040000: the
    // experiment stops exactly at the final look
    val late = SparkEntry.queries("q337_obf_sequential")(spark,
      fixture(Seq.fill(5)(1L) ++ Seq.fill(5)(3L),
        Seq.fill(5)(2L) ++ Seq.fill(5)(6L), 45L, "graftobf1")).collect()
      .map(r => (r.getAs[Int]("look"), r.getAs[Long]("z_micro"),
        r.getAs[Boolean]("crossed"), r.getAs[Boolean]("stopped")))
    assert(late.toList === List(
      (1, -1L, false, false), (2, -1L, false, false),
      (3, -1L, false, false), (4, -1L, false, false),
      (5, 2828430L, true, true)), late.mkString("\n"))
    // purchases on day 5 — a huge effect visible from look 1: every look
    // crosses (the cumulative metric never changes after block 1), but
    // `stopped` marks ONLY the first crossing
    val early = SparkEntry.queries("q337_obf_sequential")(spark,
      fixture(Seq.fill(5)(0L) ++ Seq.fill(5)(2L),
        Seq.fill(5)(10L) ++ Seq.fill(5)(30L), 5L, "graftobf2")).collect()
      .map(r => (r.getAs[Int]("look"), r.getAs[Long]("z_micro"),
        r.getAs[Boolean]("crossed"), r.getAs[Boolean]("stopped")))
    assert(early.toList === List(
      (1, 5978510L, true, true), (2, 5978510L, true, false),
      (3, 5978510L, true, false), (4, 5978510L, true, false),
      (5, 5978510L, true, false)), early.mkString("\n"))
  }

  test("q339 Neyman allocation: budget flows to the volatile stratum; the all-constant corpus falls back to exact proportional shares") {
    import spark.implicits._
    def fixture(rows: Seq[(String, Long)], tag: String): String = {
      val docs = rows.zipWithIndex.map { case ((lang, nc), i) =>
        (i.toLong, "x", lang, "t", nc)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q339_neyman_allocation")(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toMap
    // stratum a is constant (σ = 0 → weight 0); stratum b alternates
    // 100/300: N·σ = √(10·5·10⁵ − (2000)²) = √10⁶ = 1000 EXACTLY →
    // the whole budget lands on b, flagged over-allocated (1000 > 10)
    val neyman = run(fixture(
      (1 to 10).map(_ => ("aa", 100L)) ++
        (1 to 5).flatMap(_ => Seq(("bb", 100L), ("bb", 300L))), "graftny1"))
    assert(neyman("aa") === ((10L, 0L, 0L, false)), neyman.toString)
    assert(neyman("bb") === ((10L, 1000L, 1000L, true)), neyman.toString)
    // both strata constant → ΣW = 0 → the documented proportional
    // fallback: 1000·10/40 = 250 and 1000·30/40 = 750, summing exactly
    val flat = run(fixture(
      (1 to 10).map(_ => ("aa", 100L)) ++ (1 to 30).map(_ => ("bb", 200L)),
      "graftny2"))
    assert(flat("aa") === ((10L, 0L, 250L, true)), flat.toString)
    assert(flat("bb") === ((30L, 0L, 750L, true)), flat.toString)
  }

  test("q341 priority sample: a sub-k corpus is kept whole with exact weights; the sf sample's subset-sum estimate lands in a deterministic band") {
    import spark.implicits._
    // 10 orders, k = 100: everything sampled, τ = 0, est = w exactly —
    // the estimator degenerates to the exact total
    val small = (1L to 10L).map(i => (i, "2020-01-01", i * 11.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("graftps").toString
    small.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val all = SparkEntry.queries("q341_priority_sample")(spark, dir).collect()
    assert(all.length === 10)
    all.foreach { r =>
      assert(r.getAs[Long]("est_weight_cents") ===
        r.getAs[Long]("weight_cents"), r.toString)
    }
    assert(all.map(_.getAs[Long]("weight_cents")).sum === (1L to 10L)
      .map(_ * 1100L).sum)
    // on the sf corpus: exactly k rows, ranks 1..k, est ≥ w everywhere,
    // and the Duffield–Lund–Thorup subset-sum estimate of the WHOLE
    // corpus lands within a deterministic band of the true total (the
    // draws are md5-deterministic, so this can never flake once green)
    val sample = q("q341_priority_sample").collect()
    assert(sample.length === 100)
    assert(sample.map(_.getAs[Int]("rank")).toList === (1 to 100).toList)
    sample.foreach(r => assert(r.getAs[Long]("est_weight_cents") >=
      r.getAs[Long]("weight_cents")))
    val est = sample.map(_.getAs[Long]("est_weight_cents")).sum.toDouble
    val truth = graft.sources.Tables.orders(spark, sf)
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")))
      .head().getLong(0).toDouble
    assert(math.abs(est - truth) / truth < 0.35,
      s"est=$est truth=$truth rel=${math.abs(est - truth) / truth}")
  }

  test("q342 OLS Cramer: a planted exact linear law recovers beta and R2 = 1e6 exactly; collinear features report the det-0 sentinels") {
    import spark.implicits._
    // per-user (pre purchases x1, clicks x2, post purchases y) with
    // y = 2 + 3·x1 + 1·x2 EXACTLY — Cramer must return
    // (2e6, 3e6, 1e6) and a perfect R²
    val dayNs = 86400L * 1000000000L
    def fixture(users: Seq[(Long, Long, Long)], tag: String): String = {
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      users.zipWithIndex.foreach { case ((x1, x2, y), i) =>
        val u = i.toLong + 1L
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
        (1L to x1).foreach { _ =>
          eid += 1; rows += ((eid, 1L * dayNs, u, "purchase", 1.0, "{}"))
        }
        (1L to x2).foreach { _ =>
          eid += 1; rows += ((eid, 2L * dayNs, u, "click", 1.0, "{}"))
        }
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val xs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 1L),
      (2L, 3L), (3L, 2L), (0L, 2L))
    val exact = SparkEntry.queries("q342_ols_cramer")(spark,
      fixture(xs.map { case (a, b) => (a, b, 2L + 3L * a + b) },
        "graftols1")).head()
    assert(exact.getAs[Long]("n_users") === 8L, exact.toString)
    assert(exact.getAs[Long]("b0_ppm") === 2000000L, exact.toString)
    assert(exact.getAs[Long]("b1_ppm") === 3000000L, exact.toString)
    assert(exact.getAs[Long]("b2_ppm") === 1000000L, exact.toString)
    assert(exact.getAs[Long]("r2_ppm") === 1000000L, exact.toString)
    assert(exact.getAs[Boolean]("fit_ok"), exact.toString)
    // x2 ≡ x1 → X'X singular → det 0 → sentinels, never a division
    val col0 = SparkEntry.queries("q342_ols_cramer")(spark,
      fixture(Seq((1L, 1L, 5L), (2L, 2L, 8L), (3L, 3L, 11L),
        (4L, 4L, 14L)), "graftols2")).head()
    assert(!col0.getAs[Boolean]("fit_ok"), col0.toString)
    assert(col0.getAs[Long]("b1_ppm") === -1L, col0.toString)
    assert(col0.getAs[Long]("r2_ppm") === -1L, col0.toString)
  }

  test("q344 DP budget: the p99 clip neutralizes a planted whale with hand-exact clipped mass, scale, and error ratio") {
    import spark.implicits._
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    def emit(u: Long, t: String, k: Long): Unit = (1L to k).foreach { _ =>
      eid += 1; rows += ((eid, 0L, u, t, 1.0, "{}"))
    }
    // click: 99 users contribute 1, one whale contributes 100 —
    // p99 of 100 contributions is the 99th = 1, so clip = 1,
    // clipped = 99, total = 199, clipped_ppm = 99e6//199 = 497487,
    // scale(ε=1) = 1e6, err = 1e6//199 = 5025
    (1L to 99L).foreach(emit(_, "click", 1L))
    emit(100L, "click", 100L)
    // view: 50 uniform users — the clip bites nothing
    (1L to 50L).foreach(emit(_, "view", 1L))
    val dir = java.nio.file.Files.createTempDirectory("graftdp").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q344_dp_budget")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(got("click") === ((100L, 199L, 1L, 99L, 497487L, 1000000L,
      5025L)), got("click").toString)
    assert(got("view") === ((50L, 50L, 1L, 0L, 0L, 1000000L, 20000L)),
      got("view").toString)
  }

  test("q345 quantile effects: a planted uniform shift reports the exact constant QTE at every decile") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a0 = (1L to 400L).filter(armOf(_) == 0L).take(10)
    val a1 = (1L to 400L).filter(armOf(_) == 1L).take(10)
    val dayNs = 86400L * 1000000000L
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    def plant(u: Long, y: Long): Unit = {
      eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
      eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
      (1L to y).foreach { _ =>
        eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
      }
    }
    // control y = 1..10, treat y = 11..20: nearest-rank decile d of 10
    // values is the d-th smallest, so QTE is EXACTLY 10 at every decile
    a0.zipWithIndex.foreach { case (u, i) => plant(u, i + 1L) }
    a1.zipWithIndex.foreach { case (u, i) => plant(u, i + 11L) }
    val dir = java.nio.file.Files.createTempDirectory("graftqte").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q345_quantile_effects")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toList === (1 to 9).map(d =>
      (d, d.toLong, d + 10L, 10L)).toList, got.mkString("\n"))
  }

  test("q346 covariate balance: a balanced covariate scores 0, a planted imbalance the exact milli SMD, and a zero-variance shift the sentinel") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a0 = (1L to 400L).filter(armOf(_) == 0L).take(10)
    val a1 = (1L to 400L).filter(armOf(_) == 1L).take(10)
    val dayNs = 86400L * 1000000000L
    def fixture(cl1: Seq[Long], tag: String): String = {
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      def plant(u: Long, pre: Long, clicks: Long): Unit = {
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
        (1L to pre).foreach { _ =>
          eid += 1; rows += ((eid, 1L * dayNs, u, "purchase", 1.0, "{}"))
        }
        (1L to clicks).foreach { _ =>
          eid += 1; rows += ((eid, 2L * dayNs, u, "click", 1.0, "{}"))
        }
      }
      // pre purchases {1×5, 3×5} in BOTH arms — exactly balanced
      a0.zipWithIndex.foreach { case (u, i) =>
        plant(u, if (i % 2 == 0) 1L else 3L, 2L)
      }
      a1.zipWithIndex.foreach { case (u, i) =>
        plant(u, if (i % 2 == 0) 1L else 3L, cl1(i))
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q346_covariate_balance")(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toMap
    // treat clicks {2×5, 6×5}: µ 2 vs 4, pooled var (0+4)/2 = 2 →
    // sd_micro = isqrt(2e12) = 1414213, smd = 2e6·1000//1414213 = 1414
    val graded = run(fixture((0 until 10).map(i =>
      if (i % 2 == 0) 2L else 6L), "graftbal1"))
    assert(graded("pre_purchases") === ((2000000L, 2000000L, 0L, true)),
      graded.toString)
    assert(graded("clicks") === ((2000000L, 4000000L, 1414L, false)),
      graded.toString)
    // treat clicks all 4: both arms CONSTANT but different — zero pooled
    // variance with a real shift is the −1 sentinel, never a division
    val const = run(fixture(Seq.fill(10)(4L), "graftbal2"))
    assert(const("clicks") === ((2000000L, 4000000L, -1L, false)),
      const.toString)
  }

  test("q347 DiD: a planted treatment lift on top of a common trend reports the exact effect; a pure parallel shift reports zero and the sentinel") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dayNs = 86400L * 1000000000L
    def fixture(u0: Seq[(Long, Long)], u1: Seq[(Long, Long)],
        tag: String): String = {
      val a0 = (1L to 400L).filter(armOf(_) == 0L).take(u0.size)
      val a1 = (1L to 400L).filter(armOf(_) == 1L).take(u1.size)
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      (a0.zip(u0) ++ a1.zip(u1)).foreach { case (u, (pre, post)) =>
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
        (1L to pre).foreach { _ =>
          eid += 1; rows += ((eid, 1L * dayNs, u, "purchase", 1.0, "{}"))
        }
        (1L to post).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    def run(dir: String) =
      SparkEntry.queries("q347_diff_in_diff")(spark, dir).head()
    // control +1 for everyone; treat diffs {4×5, 0×5} (mean +2):
    // DiD = 1e6 exactly; vsum = var(d₁)·1e12/10 = 4e11, isqrt 632455,
    // z = 1e12//632455 = 1581140 < crit → not significant (n = 10)
    val lift = run(fixture(Seq.fill(10)((2L, 3L)),
      (1 to 5).map(_ => (2L, 6L)) ++ (1 to 5).map(_ => (2L, 2L)),
      "graftdid1"))
    assert(lift.getAs[Long]("pre_control_micro") === 2000000L, lift.toString)
    assert(lift.getAs[Long]("post_control_micro") === 3000000L, lift.toString)
    assert(lift.getAs[Long]("did_micro") === 1000000L, lift.toString)
    assert(lift.getAs[Long]("z_micro") === 1581140L, lift.toString)
    assert(!lift.getAs[Boolean]("significant"), lift.toString)
    // identical +2 shift in both arms: any time-invariant arm difference
    // cancels — DiD exactly 0, zero pooled diff variance → z sentinel
    val par = run(fixture(Seq.fill(10)((1L, 3L)), Seq.fill(10)((4L, 6L)),
      "graftdid2"))
    assert(par.getAs[Long]("did_micro") === 0L, par.toString)
    assert(par.getAs[Long]("z_micro") === -1L, par.toString)
    assert(!par.getAs[Boolean]("significant"), par.toString)
  }

  test("q348 RDD: a planted level jump at the cutoff reports the exact intercept difference; out-of-band rows are ignored") {
    import spark.implicits._
    // below side: flat y = 1 at r ∈ {−2000, −1000}; above side: flat
    // y = 3 at r ∈ {1000, 2000} → intercepts 1e6 / 3e6, effect 2e6;
    // customer 99 sits OUTSIDE the ±5000-dollar band with y = 50 and
    // must not perturb anything
    val cust = Seq(
      (1L, -20.0), (2L, -10.0), (3L, 10.0), (4L, 20.0), (99L, 6000.0))
      .toDF("c_custkey", "c_acctbal")
    var oid = 0L
    val orders = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def buy(c: Long, k: Long): Unit = (1L to k).foreach { _ =>
      oid += 1; orders += ((oid, c, "2020-01-01"))
    }
    buy(1L, 1L); buy(2L, 1L); buy(3L, 3L); buy(4L, 3L); buy(99L, 50L)
    val dir = java.nio.file.Files.createTempDirectory("graftrdd").toString
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    orders.toSeq.toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q348_reg_discontinuity")(spark, dir).head()
    assert(r.getAs[Long]("n_below") === 2L, r.toString)
    assert(r.getAs[Long]("n_above") === 2L, r.toString)
    assert(r.getAs[Long]("a_below_ppm") === 1000000L, r.toString)
    assert(r.getAs[Long]("slope_below_e12") === 0L, r.toString)
    assert(r.getAs[Long]("a_above_ppm") === 3000000L, r.toString)
    assert(r.getAs[Long]("slope_above_e12") === 0L, r.toString)
    assert(r.getAs[Long]("effect_ppm") === 2000000L, r.toString)
    assert(r.getAs[Boolean]("fit_ok"), r.toString)
  }

  test("q349 IV/Wald: a textbook encouragement fixture recovers the exact complier effect; a zero first stage reports the weak-instrument sentinel") {
    import spark.implicits._
    val armOf = (1L to 400L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dayNs = 86400L * 1000000000L
    def fixture(take0: Int, take1: Int, tag: String): String = {
      val a0 = (1L to 400L).filter(armOf(_) == 0L).take(10)
      val a1 = (1L to 400L).filter(armOf(_) == 1L).take(10)
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      def plant(u: Long, takes: Boolean): Unit = {
        eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, u, "view", 1.0, "{}"))
        if (takes) { eid += 1; rows += ((eid, 2L * dayNs, u, "click", 1.0, "{}")) }
        val y = if (takes) 5L else 1L
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, u, "purchase", 1.0, "{}"))
        }
      }
      a0.zipWithIndex.foreach { case (u, i) => plant(u, i < take0) }
      a1.zipWithIndex.foreach { case (u, i) => plant(u, i < take1) }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // encouragement moved take-up 20% → 80%; takers buy 5, others 1:
    // reduced form 2.4, first stage 0.6, LATE = 4e6 ppm — exactly the
    // planted complier effect (5 − 1); first-stage z = 3354110 → strong
    val strong = SparkEntry.queries("q349_iv_wald")(spark,
      fixture(2, 8, "graftiv1")).head()
    assert(strong.getAs[Long]("takeup_control_ppm") === 200000L, strong.toString)
    assert(strong.getAs[Long]("takeup_treat_ppm") === 800000L, strong.toString)
    assert(strong.getAs[Long]("reduced_form_micro") === 2400000L, strong.toString)
    assert(strong.getAs[Long]("first_stage_micro") === 600000L, strong.toString)
    assert(strong.getAs[Long]("late_ppm") === 4000000L, strong.toString)
    assert(!strong.getAs[Boolean]("weak_instrument"), strong.toString)
    // identical take-up in both arms: first stage 0 → the LATE is NOT
    // quoted (−1) and the weak flag fires
    val weak = SparkEntry.queries("q349_iv_wald")(spark,
      fixture(5, 5, "graftiv2")).head()
    assert(weak.getAs[Long]("first_stage_micro") === 0L, weak.toString)
    assert(weak.getAs[Long]("late_ppm") === -1L, weak.toString)
    assert(weak.getAs[Boolean]("weak_instrument"), weak.toString)
  }

  test("q350 propensity stratification: a planted confounder biases the naive read; the stratified estimator recovers the exact effect; a no-control stratum trips positivity and is excluded") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // potential outcomes y = base(stratum) + 2·t — true ATE 2.0 — but
    // exposure (clicking) is SELF-SELECTED with propensity rising in
    // pre-period activity x: stratum 0 (x = 0, base 1): 28 control /
    // 2 treated; stratum 1 (x = 3, base 5): 2 control / 18 treated;
    // stratum 2 (x = 6): 3 TREATED WHALES (y = 100), zero control —
    // the positivity violation. Control users click once, treated ten
    // times; the cl median over 30 controls + 23 treated is the
    // control value, so t = cl > med splits exactly as planted.
    var eid = 0L
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, String, Double, String)]
    var uid = 0L
    def plant(n: Int, x: Long, y: Long, treated: Boolean): Unit =
      (1 to n).foreach { _ =>
        uid += 1
        eid += 1; rows += ((eid, 0L, uid, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, uid, "view", 1.0, "{}"))
        (1L to (if (treated) 10L else 1L)).foreach { _ =>
          eid += 1; rows += ((eid, 2L * dayNs, uid, "click", 1.0, "{}"))
        }
        (1L to x).foreach { _ =>
          eid += 1; rows += ((eid, 1L * dayNs, uid, "purchase", 1.0, "{}"))
        }
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, uid, "purchase", 1.0, "{}"))
        }
      }
    plant(28, 0L, 1L, treated = false); plant(2, 0L, 3L, treated = true)
    plant(2, 3L, 5L, treated = false); plant(18, 3L, 7L, treated = true)
    plant(3, 6L, 100L, treated = true)
    val dir = java.nio.file.Files.createTempDirectory("graftps").toString
    rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q350_propensity_strat")(spark, dir)
      .collect()
    assert(got.length === 3, got.mkString("\n"))
    val byS = got.map(r => r.getAs[Long]("stratum") -> r).toMap
    // per-stratum: exact count-ratio propensities and means
    assert(byS(0L).getAs[Long]("propensity_ppm") === 66666L)
    assert(byS(0L).getAs[Long]("delta_micro") === 2000000L)
    assert(byS(1L).getAs[Long]("propensity_ppm") === 900000L)
    assert(byS(1L).getAs[Long]("delta_micro") === 2000000L)
    assert(byS(0L).getAs[Boolean]("positivity"))
    assert(byS(1L).getAs[Boolean]("positivity"))
    // the violating stratum: flagged, control-mean sentinel, excluded
    assert(!byS(2L).getAs[Boolean]("positivity"))
    assert(byS(2L).getAs[Long]("mean_control_micro") === -1L)
    assert(byS(2L).getAs[Long]("mean_treat_micro") === 100000000L)
    val g = byS(0L)
    assert(g.getAs[Long]("n_used") === 50L, g.toString)
    assert(g.getAs[Long]("n_dropped") === 1L, g.toString)
    // naive = 432e6/23 − 38e6/30 = 17.52 — 8.8× the truth: the
    // confounder concentrates treated users in high-base strata AND
    // the naive read keeps the whale stratum the estimators drop
    assert(g.getAs[Long]("naive_micro") === 17515942L, g.toString)
    // Cochran recovers the planted 2.0 EXACTLY; HT-IPW differs only by
    // the ppm weight truncation (w₁(s=0) = 10¹² div 66666)
    assert(g.getAs[Long]("ate_strat_micro") === 2000000L, g.toString)
    assert(g.getAs[Long]("ate_ipw_micro") === 2000018L, g.toString)
  }

  test("q359 Neyman CI: a planted known-variance design matches an independent BigInt replica exactly and the interval covers the planted effect; a singleton arm trips the small-stratum sentinel on the total row") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // plantU writes one user: x pre-period purchases (day 1), y
    // post-period purchases (day 20), clicks day 2 (1 control /
    // 10 treated — the cl median over equal arm sizes is the control
    // value, so t = cl > med splits exactly as planted), calendar
    // pinned by views on days 0 and 29 (split = day 15)
    def fixture(users: Seq[(Long, Long, Boolean)], tag: String): String = {
      var eid = 0L; var uid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      users.foreach { case (x, y, treated) =>
        uid += 1
        eid += 1; rows += ((eid, 0L, uid, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, uid, "view", 1.0, "{}"))
        (1L to (if (treated) 10L else 1L)).foreach { _ =>
          eid += 1; rows += ((eid, 2L * dayNs, uid, "click", 1.0, "{}"))
        }
        (1L to x).foreach { _ =>
          eid += 1; rows += ((eid, 1L * dayNs, uid, "purchase", 1.0, "{}"))
        }
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, uid, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // design A — both arms vary within both strata, effect +2 in each:
    // stratum 0 (x = 0): control y {1,1,3,3}, treated y {2,4,4,6};
    // stratum 1 (x = 3): control y {5,7},     treated y {6,10}
    val a = Seq[(Long, Long, Boolean)](
      (0L, 1L, false), (0L, 1L, false), (0L, 3L, false), (0L, 3L, false),
      (0L, 2L, true), (0L, 4L, true), (0L, 4L, true), (0L, 6L, true),
      (3L, 5L, false), (3L, 7L, false), (3L, 6L, true), (3L, 10L, true))
    val gotA = SparkEntry.queries("q359_neyman_ci")(spark,
      fixture(a, "graftney1")).collect()
    val byS = gotA.filter(_.getString(0) == "stratum")
      .map(r => r.getAs[Long]("stratum") -> r).toMap
    // independent BigInt replica from the raw y lists (own bisection
    // sqrt — not the engine's isqrt)
    def bisqrt(x: BigInt): BigInt = {
      var lo = BigInt(0); var hi = x + 1
      while (lo < hi - 1) {
        val mid = (lo + hi) / 2
        if (mid * mid <= x) lo = mid else hi = mid
      }
      lo
    }
    def vmOf(ys: Seq[Long]): BigInt = {
      val n = BigInt(ys.size); val sy = BigInt(ys.sum)
      val syy = BigInt(ys.map(v => v * v).sum)
      (n * syy - sy * sy) * BigInt("1000000000000") / (n * n * (n - 1))
    }
    val cells = Map(
      0L -> (Seq(2L, 4L, 4L, 6L), Seq(1L, 1L, 3L, 3L)),
      1L -> (Seq(6L, 10L), Seq(5L, 7L)))
    cells.foreach { case (st, (yt, yc)) =>
      val r = byS(st)
      val (vm1, vm0) = (vmOf(yt), vmOf(yc))
      val delta = BigInt(yt.sum) * 1000000L / yt.size -
        BigInt(yc.sum) * 1000000L / yc.size
      val se = bisqrt(vm1 + vm0)
      val half = BigInt(1959964L) * se / 1000000L
      assert(r.getAs[Long]("varm_treat_micro2") === vm1.toLong, r.toString)
      assert(r.getAs[Long]("varm_control_micro2") === vm0.toLong, r.toString)
      assert(r.getAs[Long]("est_micro") === delta.toLong, r.toString)
      assert(r.getAs[Long]("se_micro") === se.toLong, r.toString)
      assert(r.getAs[Long]("ci_lo_micro") === (delta - half).toLong)
      assert(r.getAs[Long]("ci_hi_micro") === (delta + half).toLong)
      assert(r.getAs[Boolean]("positivity") && !r.getAs[Boolean]("small"))
      // the interval covers the planted per-stratum effect of +2
      assert((delta - half).toLong <= 2000000L &&
        2000000L <= (delta + half).toLong, r.toString)
    }
    // stratum 0's replica lands on the clean closed forms: vm sum
    // 10¹² − 1, se 999999, half 1959962
    assert(byS(0L).getAs[Long]("se_micro") === 999999L)
    val tot = gotA.filter(_.getString(0) == "total").head
    // stratified combination: ate exactly the planted 2.0; Var =
    // (8²·(10¹²−1) + 4²·5·10¹²) div 12² = 999999999999
    assert(tot.getAs[Long]("est_micro") === 2000000L, tot.toString)
    assert(tot.getAs[Long]("se_micro") === 999999L, tot.toString)
    assert(tot.getAs[Long]("ci_lo_micro") === 40038L, tot.toString)
    assert(tot.getAs[Long]("ci_hi_micro") === 3959962L, tot.toString)
    assert(tot.getAs[Long]("n_s") === 12L && tot.getAs[Long]("n_small") === 0L)
    assert(tot.getAs[Long]("ci_lo_micro") <= 2000000L &&
      2000000L <= tot.getAs[Long]("ci_hi_micro"))
    // design B — design A plus a stratum (x = 6) whose treated arm is
    // a SINGLETON: its sample variance is undefined, so the total row
    // refuses the CI outright instead of silently dropping a stratum
    // the point estimate still includes
    val b = a ++ Seq[(Long, Long, Boolean)](
      (6L, 1L, false), (6L, 1L, false), (6L, 9L, true))
    val dirB = fixture(b, "graftney2")
    val gotB = SparkEntry.queries("q359_neyman_ci")(spark, dirB).collect()
    val sm = gotB.filter(_.getString(0) == "stratum")
      .map(r => r.getAs[Long]("stratum") -> r).toMap
    assert(sm(2L).getAs[Boolean]("small"), sm(2L).toString)
    assert(sm(2L).getAs[Long]("varm_treat_micro2") === -1L)
    assert(sm(2L).getAs[Long]("se_micro") === -1L)
    assert(sm(2L).getAs[Long]("est_micro") === 8000000L) // 9 − 1
    val totB = gotB.filter(_.getString(0) == "total").head
    // ate still includes the small stratum: (8·2 + 4·2 + 3·8)·10⁶/15
    assert(totB.getAs[Long]("est_micro") === 3200000L, totB.toString)
    assert(totB.getAs[Long]("se_micro") === -1L, totB.toString)
    assert(totB.getAs[Long]("ci_lo_micro") === -1L)
    assert(totB.getAs[Long]("ci_hi_micro") === -1L)
    assert(totB.getAs[Long]("n_small") === 1L)
    assert(totB.getAs[Boolean]("small"))
    // cross-query no-drift: q350's point estimate on the identical
    // fixture digit-for-digit (same dir — the leaves are memoized)
    val q350B = SparkEntry.queries("q350_propensity_strat")(spark, dirB)
      .head()
    assert(q350B.getAs[Long]("ate_strat_micro") === 3200000L)
  }

  test("q361 Greenwood bands: a planted censoring pattern matches an independent BigInt replica exactly, the survival column equals q267 digit-for-digit, and a fully-consumed risk set poisons the final row") {
    import spark.implicits._
    def fixture(rows: Seq[(Long, String, String)], tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.flatMap { case (c, f, l) => Seq((c, f), (c, l)) }
        .toDF("o_custkey", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    // censoring pattern: dmax = 2020-12-31 → churn horizon 2020-10-02;
    // three churners at t = 10, one at t = 20, one at t = 50, two
    // censored anchors at t = 365 — risk sets 7 → 4 → 3
    val dirA = fixture(Seq(
      (1L, "2020-01-01", "2020-01-11"), (2L, "2020-01-01", "2020-01-11"),
      (3L, "2020-01-01", "2020-01-11"), (4L, "2020-01-01", "2020-01-21"),
      (5L, "2020-01-01", "2020-02-20"), (6L, "2020-01-01", "2020-12-31"),
      (7L, "2020-01-01", "2020-12-31")), "graftgw1")
    val got = SparkEntry.queries("q361_km_greenwood")(spark, dirA)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // independent replica: own bisection sqrt, own fold
    def bisqrt(x: BigInt): BigInt = {
      var lo = BigInt(0); var hi = x + 1
      while (lo < hi - 1) {
        val mid = (lo + hi) / 2
        if (mid * mid <= x) lo = mid else hi = mid
      }
      lo
    }
    val grid = Seq((10L, 7L, 3L), (20L, 4L, 1L), (50L, 3L, 1L))
    var sR = BigInt("1000000000000"); var gR = BigInt(0)
    val want = grid.map { case (t, n, dd) =>
      sR = sR * (n - dd) / n
      gR += BigInt(dd) * BigInt("1000000000000") / (BigInt(n) * (n - dd))
      val se = sR * bisqrt(gR) / 1000000L
      val half = BigInt(1959964L) * se / 1000000L
      (t, n, dd, sR.toLong, se.toLong,
        (sR - half).max(BigInt(0)).toLong,
        (sR + half).min(BigInt("1000000000000")).toLong)
    }
    assert(got.toList === want.toList, got.toList.toString)
    // hand-pinned anchors: S = 4/7, 3/7, 2/7 in truncating e12
    assert(got.map(_._4).toList ===
      List(571428571428L, 428571428571L, 285714285714L))
    // every band brackets its estimate and respects the [0, 1e12] clamp
    got.foreach { r =>
      assert(r._6 <= r._4 && r._4 <= r._7 && r._6 >= 0L &&
        r._7 <= 1000000000000L, r.toString)
    }
    // cross-query no-drift: the survival column equals q267
    // digit-for-digit on the same memoized leaf
    val km = SparkEntry.queries("q267_kaplan_meier")(spark, dirA)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    got.foreach(r => assert(km(r._1) === r._4, r.toString))
    // a fully-consumed final risk set (n = d): survival 0, the
    // Greenwood term is undefined — the -1 sentinels, necessarily on
    // the last event row
    val dirB = fixture(Seq(
      (1L, "2020-06-01", "2020-12-31"), // censored anchor, t = 213
      (2L, "2020-01-01", "2020-03-01"), // churn, t = 60
      (3L, "2019-01-01", "2019-12-31")), "graftgw2") // churn, t = 364
    val gotB = SparkEntry.queries("q361_km_greenwood")(spark, dirB)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(gotB.map(x => (x._1, x._2, x._3)).toList ===
      List((60L, 3L, 1L), (364L, 1L, 1L)), gotB.toList.toString)
    assert(gotB(0)._4 === 666666666666L && gotB(0)._5 > 0L)
    assert(gotB(1)._4 === 0L)
    assert((gotB(1)._5, gotB(1)._6, gotB(1)._7) === ((-1L, -1L, -1L)))
  }

  test("q364 MDE advisor: a planted two-arm conversion corpus matches the closed-form replica exactly, and a conversionless corpus reports the sizing sentinels") {
    import spark.implicits._
    val armOf = (1L to 200L).toDF("user_id")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("user_id"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a0 = (1L to 200L).filter(armOf(_) == 0L).take(10)
    val a1 = (1L to 200L).filter(armOf(_) == 1L).take(10)
    def fixture(conv0: Int, conv1: Int, tag: String): String = {
      var eid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      (a0.zipWithIndex.map { case (u, i) => (u, i < conv0) } ++
        a1.zipWithIndex.map { case (u, i) => (u, i < conv1) })
        .foreach { case (u, converts) =>
          eid += 1; rows += ((eid, 0L, u, "view", 1.0, "{}"))
          if (converts) {
            eid += 1; rows += ((eid, 0L, u, "purchase", 1.0, "{}"))
          }
        }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props").write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      dir
    }
    def bisqrt(x: BigInt): BigInt = {
      var lo = BigInt(0); var hi = x + 1
      while (lo < hi - 1) {
        val mid = (lo + hi) / 2
        if (mid * mid <= x) lo = mid else hi = mid
      }
      lo
    }
    // 2/10 vs 5/10 converting: pooled p = 350000 ppm
    val got = SparkEntry.queries("q364_mde_advisor")(spark,
      fixture(2, 5, "graftmde1")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val zs = BigInt(1959964L + 841621L)
    val pp = BigInt(7) * 1000000L / 20
    assert(pp.toLong === 350000L)
    val x = pp * (1000000L - pp.toLong) * 20 *
      BigInt("1000000000000") / 100
    val mde = (zs * bisqrt(x) / BigInt("1000000000000")).toLong
    assert(got(("mde", -1L)) === ((10L, 10L, 350000L, mde)),
      got.toString)
    // observed delta: 500000 − 200000
    assert(got(("observed", -1L)) === ((10L, 10L, 350000L, 300000L)))
    // with 10 users/arm the MDE is enormous — the advisor's point
    assert(mde > 500000L, mde.toString)
    Seq(1L, 2L, 5L, 10L).foreach { lift =>
      val dm = pp * lift / 100
      val num = 2 * pp * (1000000L - pp.toLong) * zs * zs
      val den = BigInt("1000000000000") * dm * dm
      val nReq = ((num + den - 1) / den).toLong
      assert(got(("required", lift)) ===
        ((nReq, nReq, 350000L, dm.toLong)), s"lift $lift: $got")
    }
    // a 1% lift on a 35% base needs ~quarter-million users per arm —
    // sanity-anchor the magnitude class
    assert(got(("required", 1L))._1 > 100000L)
    assert(got(("required", 10L))._1 < got(("required", 1L))._1 / 50L)
    // conversionless corpus: p = 0 → nothing can be sized — the mde
    // and required-n columns carry the −1 sentinel (the target delta
    // itself is genuinely 0)
    val none = SparkEntry.queries("q364_mde_advisor")(spark,
      fixture(0, 0, "graftmde2")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(5))).toMap
    assert(none(("mde", -1L))._2 === -1L)
    assert(none(("observed", -1L))._2 === 0L)
    Seq(1L, 2L, 5L, 10L).foreach { l =>
      assert(none(("required", l))._1 === -1L, none.toString)
      assert(none(("required", l))._2 === 0L, none.toString)
    }
  }

  test("q365 Wilson intervals: a planted small-segment corpus matches the BigInt replica exactly, Wald escapes [0,1] where Wilson stays inside, and the k=0 lower bound lands on exactly 0") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    // epoch day 0 = Thursday → Spark dayofweek 5; day 1 = Friday (6);
    // day 2 = Saturday (7). Three planted segments:
    //   Thu: n=4, k=1  (the Wald-escape case)
    //   Fri: n=2, k=0  (the exact-zero lower bound)
    //   Sat: n=3, k=3  (the p=1 edge: Wald collapses to width 0)
    var eid = 0L
    def ev(day: Long, purch: Boolean) = {
      eid += 1
      (eid, day * dayNs, eid, if (purch) "purchase" else "view", 1.0,
        "{}")
    }
    val rows = Seq(ev(0, true), ev(0, false), ev(0, false),
      ev(0, false), ev(1, false), ev(1, false), ev(2, true),
      ev(2, true), ev(2, true))
    val dir = java.nio.file.Files.createTempDirectory("graftwil")
      .toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q365_wilson_intervals")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    def bisqrt(x: BigInt): BigInt = {
      var lo = BigInt(0); var hi = x + 1
      while (lo < hi - 1) {
        val mid = (lo + hi) / 2
        if (mid * mid <= x) lo = mid else hi = mid
      }
      lo
    }
    def replica(n: Long, k: Long) = {
      val zm = BigInt(1959964L); val z2 = zm * zm
      val e12 = BigInt("1000000000000")
      val rate = BigInt(k) * 1000000L / n
      val t = zm * bisqrt(BigInt(n) * (BigInt(n) * z2 +
        4 * BigInt(k) * (n - k) * e12)) / n
      val den = 2 * (BigInt(n) * e12 + z2)
      val base = 2 * BigInt(k) * e12 + z2
      val wh = zm * bisqrt(BigInt(k) * (n - k) * e12 / n) /
        (BigInt(n) * 1000000L)
      (n, k, rate.toLong, ((base - t) * 1000000L / den).toLong,
        ((base + t) * 1000000L / den).toLong, (rate - wh).toLong,
        (rate + wh).toLong)
    }
    assert(got(5L) === replica(4L, 1L), got.toString)
    assert(got(6L) === replica(2L, 0L), got.toString)
    assert(got(7L) === replica(3L, 3L), got.toString)
    // the laws the operator exists for:
    assert(got(5L)._6 < 0L, "Wald must escape below 0 at (n=4, k=1)")
    assert(got(5L)._4 > 0L, "Wilson must stay inside")
    assert(got(5L)._4 < got(5L)._3 && got(5L)._3 < got(5L)._5)
    // k = 0: isqrt(n²z²) = n·z exactly → Wilson lo exactly 0, while
    // Wald collapses to the useless [0, 0]
    assert(got(6L)._4 === 0L && got(6L)._6 === 0L && got(6L)._7 === 0L)
    assert(got(6L)._5 > 0L, "Wilson upper stays informative at k=0")
    // k = n: Wald width 0 at rate 1e6; Wilson lower pulls inside
    assert(got(7L)._6 === 1000000L && got(7L)._7 === 1000000L)
    assert(got(7L)._4 < 1000000L && got(7L)._5 === 1000000L)
  }

  test("q362 Nelson-Aalen: the planted censoring pattern matches an independent replica exactly, and the fully-consumed final risk set stays well-defined where q361's Greenwood poisons") {
    import spark.implicits._
    def fixture(rows: Seq[(Long, String, String)], tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.flatMap { case (c, f, l) => Seq((c, f), (c, l)) }
        .toDF("o_custkey", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    def bisqrt(x: BigInt): BigInt = {
      var lo = BigInt(0); var hi = x + 1
      while (lo < hi - 1) {
        val mid = (lo + hi) / 2
        if (mid * mid <= x) lo = mid else hi = mid
      }
      lo
    }
    def replica(grid: Seq[(Long, Long, Long)]) = {
      var h = BigInt(0); var v = BigInt(0)
      grid.map { case (t, n, dd) =>
        val hs = BigInt(dd) * BigInt("1000000000000") / n
        h += hs; v += hs / n
        val se = bisqrt(v) * 1000000L
        val half = BigInt(1959964L) * se / 1000000L
        (t, n, dd, hs.toLong, h.toLong, se.toLong,
          (h - half).max(BigInt(0)).toLong, (h + half).toLong)
      }
    }
    val dirA = fixture(Seq(
      (1L, "2020-01-01", "2020-01-11"), (2L, "2020-01-01", "2020-01-11"),
      (3L, "2020-01-01", "2020-01-11"), (4L, "2020-01-01", "2020-01-21"),
      (5L, "2020-01-01", "2020-02-20"), (6L, "2020-01-01", "2020-12-31"),
      (7L, "2020-01-01", "2020-12-31")), "graftna1")
    val gotA = SparkEntry.queries("q362_nelson_aalen")(spark, dirA)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(gotA.toList === replica(
      Seq((10L, 7L, 3L), (20L, 4L, 1L), (50L, 3L, 1L))).toList,
      gotA.toList.toString)
    // hand anchors: H = 3/7, then +1/4, then +1/3 in truncating e12
    assert(gotA.map(_._5).toList ===
      List(428571428571L, 678571428571L, 1011904761904L))
    // the n = d final risk set: the hazard just adds a full increment
    // of 1.0 — no sentinel, the documented Nelson-Aalen advantage over
    // q361's Greenwood poisoning on the same fixture
    val dirB = fixture(Seq(
      (1L, "2020-06-01", "2020-12-31"), (2L, "2020-01-01", "2020-03-01"),
      (3L, "2019-01-01", "2019-12-31")), "graftna2")
    val gotB = SparkEntry.queries("q362_nelson_aalen")(spark, dirB)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(gotB.toList === replica(
      Seq((60L, 3L, 1L), (364L, 1L, 1L))).toList, gotB.toList.toString)
    assert(gotB(1)._4 === 1000000000000L) // the final full increment
    assert(gotB(1)._6 > 0L) // se defined where Greenwood reads -1
  }

  test("q367 EB shrinkage: a planted leaderboard matches the moment-chain replica exactly, small extreme segments shrink hardest, and a zero-variance table reports the unshrunk sentinel") {
    import spark.implicits._
    def fixture(segs: Seq[(Long, Int, Int)], tag: String): String = {
      val rows = segs.flatMap { case (sk, n, k) =>
        (1 to k).map(_ => (sk, "R")) ++ (1 to n - k).map(_ => (sk, "N"))
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toDF("l_suppkey", "l_returnflag")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      dir
    }
    // two high-volume segments (10%, 30%) and two 4-item extremes
    // (75%, 25%): m = 350000 ppm, T = 2 pseudo-observations·10³
    val segs = Seq((1L, 1000, 100), (2L, 1000, 300), (3L, 4, 3),
      (4L, 4, 1))
    val got = SparkEntry.queries("q367_eb_shrinkage")(spark,
      fixture(segs, "grafteb1")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    // independent replica of the documented moment chain
    val rates = segs.map { case (_, n, k) =>
      BigInt(k) * 1000000L / n
    }
    val sCnt = rates.size
    val m = rates.sum / sCnt
    val v = (BigInt(sCnt) * rates.map(r => r * r).sum -
      rates.sum * rates.sum) / (BigInt(sCnt) * sCnt)
    val t = m * (1000000L - m.toLong) / v - 1
    val alpha = m * t / 1000L
    val beta = (BigInt(1000000L) - m) * t / 1000L
    assert(m.toLong === 350000L && t.toLong === 2L)
    segs.foreach { case (sk, n, k) =>
      val rate = BigInt(k) * 1000000L / n
      val post = (BigInt(k) * 1000L + alpha) * 1000000L /
        (BigInt(n) * 1000L + alpha + beta)
      assert(got(sk) === ((n.toLong, k.toLong, rate.toLong,
        alpha.toLong, beta.toLong, post.toLong,
        (post - rate).toLong)), s"supplier $sk: ${got(sk)}")
    }
    // the law the operator exists for: the 4-item extremes move by
    // hundreds of thousands of ppm toward the prior mean while the
    // 1000-item segments barely move
    assert(math.abs(got(3L)._7) > 100000L && got(3L)._7 < 0L)
    assert(math.abs(got(4L)._7) > 20000L && got(4L)._7 > 0L)
    assert(math.abs(got(1L)._7) < 1000L && math.abs(got(2L)._7) < 1000L)
    // zero-variance table: every segment at the same rate — nothing
    // to fit, the loud unshrunk sentinel
    val flat = SparkEntry.queries("q367_eb_shrinkage")(spark,
      fixture(Seq((1L, 10, 5), (2L, 20, 10), (3L, 4, 2)), "grafteb2"))
      .collect()
      .map(r => (r.getLong(4), r.getLong(5), r.getLong(3),
        r.getLong(6), r.getLong(7)))
    flat.foreach { case (al, be, rate, post, sh) =>
      assert(al === -1L && be === -1L && post === rate && sh === 0L,
        flat.toList.toString)
    }
  }

  test("q366 CMH test: a planted within-stratum effect fires the stratified chi-square against the BigInt replica exactly, while a pure-confounding design (naive gap, zero within-stratum effect) reads exactly 0") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    def fixture(users: Seq[(Long, Long, Boolean)], tag: String): String = {
      var eid = 0L; var uid = 0L
      val rows = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Long, Long, String, Double, String)]
      users.foreach { case (x, y, treated) =>
        uid += 1
        eid += 1; rows += ((eid, 0L, uid, "view", 1.0, "{}"))
        eid += 1; rows += ((eid, 29L * dayNs, uid, "view", 1.0, "{}"))
        (1L to (if (treated) 10L else 1L)).foreach { _ =>
          eid += 1; rows += ((eid, 2L * dayNs, uid, "click", 1.0, "{}"))
        }
        (1L to x).foreach { _ =>
          eid += 1; rows += ((eid, 1L * dayNs, uid, "purchase", 1.0, "{}"))
        }
        (1L to y).foreach { _ =>
          eid += 1; rows += ((eid, 20L * dayNs, uid, "purchase", 1.0, "{}"))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type",
        "value", "props").write.mode("overwrite")
        .parquet(s"$dir/events.parquet")
      dir
    }
    def plant(n: Int, x: Long, y: Long, treated: Boolean) =
      Seq.fill(n)((x, y, treated))
    // design A — a REAL within-stratum effect: in both strata every
    // treated user clears the pooled y-median (9 > 1) and no control
    // does; per stratum a = 10, E = 5e6, V = (5000·5000) div 19
    val a = plant(10, 0L, 1L, treated = false) ++
      plant(10, 0L, 9L, treated = true) ++
      plant(10, 3L, 1L, treated = false) ++
      plant(10, 3L, 9L, treated = true)
    val gotA = SparkEntry.queries("q366_cmh_test")(spark,
      fixture(a, "graftcmh1")).collect()
    val byS = gotA.filter(_.getString(0) == "stratum")
      .map(r => r.getLong(1) -> r).toMap
    Seq(0L, 1L).foreach { st =>
      assert(byS(st).getAs[Long]("a_conv_treat") === 10L)
      assert(byS(st).getAs[Long]("e_micro") === 5000000L)
      assert(byS(st).getAs[Long]("v_micro") === 25000000L / 19L)
    }
    val totA = gotA.filter(_.getString(0) == "total").head
    val vSum = 2L * (25000000L / 19L)
    val cmhWant = (BigInt(10000000L) * 10000000L / vSum).toLong
    assert(totA.getAs[Long]("e_micro") === 10000000L) // A = Σ(a−E)
    assert(totA.getAs[Long]("v_micro") === vSum)
    assert(totA.getAs[Long]("cmh_micro") === cmhWant, totA.toString)
    assert(cmhWant > 3841459L && totA.getAs[Boolean]("significant"))
    // design B — PURE confounding: conversion base 25% in stratum 0 /
    // 75% in stratum 1, treated concentrated in the high-base stratum
    // (naive read: 62.5% vs 37.5%), but within every stratum treated
    // and control convert at the identical rate → a = E exactly in
    // both strata, CMH exactly 0
    val b = plant(9, 0L, 1L, treated = false) ++
      plant(3, 0L, 9L, treated = false) ++
      plant(3, 0L, 1L, treated = true) ++
      plant(1, 0L, 9L, treated = true) ++
      plant(1, 3L, 1L, treated = false) ++
      plant(3, 3L, 9L, treated = false) ++
      plant(3, 3L, 1L, treated = true) ++
      plant(9, 3L, 9L, treated = true)
    val gotB = SparkEntry.queries("q366_cmh_test")(spark,
      fixture(b, "graftcmh2")).collect()
    val totB = gotB.filter(_.getString(0) == "total").head
    assert(totB.getAs[Long]("e_micro") === 0L, totB.toString)
    assert(totB.getAs[Long]("v_micro") > 0L, totB.toString)
    assert(totB.getAs[Long]("cmh_micro") === 0L, totB.toString)
    assert(!totB.getAs[Boolean]("significant"))
  }

  test("q330 log-rank: planted separated and identical survival fixtures reproduce the hand-computed hypergeometric terms exactly") {
    import spark.implicits._
    val armOf = (1L to 200L).toDF("c")
      .withColumn("arm", graft.functions.Hashing.md5Bucket(col("c"), 2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (duration, churn) per customer: churners' last order predates the
    // censored anchors' 2020-06-01 horizon by > 90 days
    def fixture(spec: Seq[(Long, Long, Boolean)], tag: String): String = {
      // spec: (arm, duration t, churn?) — censored rows span to 06-01
      var used0 = (1L to 200L).filter(armOf(_) == 0L).iterator
      var used1 = (1L to 200L).filter(armOf(_) == 1L).iterator
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      spec.foreach { case (arm, t, churn) =>
        val u = if (arm == 0L) used0.next() else used1.next()
        rows += ((u, "2020-01-01"))
        val last = if (churn) java.time.LocalDate.parse("2020-01-01")
          .plusDays(t).toString else "2020-06-01"
        rows += ((u, last))
      }
      val dir = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toSeq.toDF("o_custkey", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    def run(dir: String) = SparkEntry.queries("q330_log_rank")(spark, dir).head()
    // separation: five arm-1 churns at t=5, five arm-0 churns at t=10,
    // one censored arm-0 anchor (t=152). Hand replay of the term algebra:
    //  t=5:  n₁=5, n₀=6, n=11, d=5 → e=5·5e6//11=2272727
    //        a=454545 b=545454 c=(6·1e6)//10=600000
    //        v=5·454545·545454·600000//1e12=743800... (summed below)
    //  t=10: n₁=0 → e-term 0, v-term 0 (one-sided risk set)
    //  O₁=5, E₁=2272727, V=743800 → χ²_micro = (5e6−2272727)²//743800
    //  = 10000024 > 3841459 → significant
    val sep = run(fixture(
      (1 to 5).map(_ => (1L, 5L, true)) ++
        (1 to 5).map(_ => (0L, 10L, true)) :+ ((0L, 152L, false)),
      "graftlr1"))
    assert(sep.getAs[Long]("n_control") === 6L, sep.toString)
    assert(sep.getAs[Long]("n_treat") === 5L, sep.toString)
    assert(sep.getAs[Long]("o1") === 5L, sep.toString)
    assert(sep.getAs[Long]("n_events") === 10L, sep.toString)
    assert(sep.getAs[Long]("e1_micro") === 2272727L, sep.toString)
    assert(sep.getAs[Long]("v_micro") === 743800L, sep.toString)
    assert(sep.getAs[Long]("chi2_micro") === 10000024L, sep.toString)
    assert(sep.getAs[Boolean]("significant"), sep.toString)
    // identical per-arm lifetimes: equal risk sets and equal events at
    // every time → O₁ = E₁ exactly, χ² = 0
    val same = run(fixture(Seq(
      (1L, 5L, true), (0L, 5L, true),
      (1L, 10L, true), (0L, 10L, true),
      (1L, 152L, false), (0L, 152L, false)), "graftlr2"))
    assert(same.getAs[Long]("o1") === 2L, same.toString)
    assert(same.getAs[Long]("e1_micro") === 2000000L, same.toString)
    assert(same.getAs[Long]("chi2_micro") === 0L, same.toString)
    assert(!same.getAs[Boolean]("significant"), same.toString)
  }

  test("q308 CUPED: fixture arms partition users; a planted linear covariate gives exact theta and 100% variance kill") {
    val r = q("q308_cuped").collect()
    assert(r.length === 2)
    assert(r.map(_.getAs[Long]("arm")).toList === List(0L, 1L))
    val ev = graft.sources.Tables.events(spark, sf)
    assert(r.map(_.getAs[Long]("n_users")).sum ===
      ev.select("user_id").distinct().count())
    assert(r.map(x => x.getAs[Long]("pre_conv") + x.getAs[Long]("post_conv"))
      .sum === ev.filter(org.apache.spark.sql.functions
        .col("event_type") === "purchase").count())
    r.foreach { row =>
      assert(row.getAs[Long]("var_reduction_ppm") <= 1000000L, row.toString)
      assert(row.getAs[Long]("mean_post_micro") ===
        row.getAs[Long]("post_conv") * 1000000L / row.getAs[Long]("n_users"))
    }
    // planted law: user i makes i purchases pre-split and 3i post-split,
    // so Y = 3X exactly → θ = cov/var = 3 (3000000 ppm, division-exact),
    // every adjusted value collapses to the one global constant
    // shift = (θppm·ΣX) div n = (3e6·820) div 40 = 61500000, and BOTH
    // arms report a 100% variance kill — the Cauchy-Schwarz identity
    // var(Y−θX) = var(Y) − cov²/var(X) hit at its floor
    import spark.implicits._
    val d1 = 1704067200L * 1000000000L  // 2024-01-01 UTC, nanos
    val d30 = 1706572800L * 1000000000L // 2024-01-30 UTC
    val rows = (1 to 40).flatMap { i =>
      (1 to i).map(k =>
        (i * 1000L + k, d1 + k * 1000L, i.toLong, "purchase", 1.0, "{}")) ++
      (1 to 3 * i).map(k =>
        (i * 100000L + k, d30 + k * 1000L, i.toLong, "purchase", 1.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graftcuped").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q308_cuped")(spark, dir).collect()
    assert(got.length === 2)
    got.foreach { row =>
      assert(row.getAs[Long]("theta_ppm") === 3000000L, row.toString)
      assert(row.getAs[Long]("post_conv") === 3L * row.getAs[Long]("pre_conv"))
      assert(row.getAs[Long]("mean_cuped_micro") === 61500000L, row.toString)
      assert(row.getAs[Long]("var_reduction_ppm") === 1000000L, row.toString)
    }
  }

  test("q309 SPRT: fixture decisions are boundary-consistent; planted pure streams stop at the exact computable trial") {
    val bound = graft.operators.Stats.sprtBound
    val incS = graft.operators.Stats.sprtIncS
    val incF = graft.operators.Stats.sprtIncF
    val r = q("q309_sprt").collect()
    assert(r.length === 2)
    r.foreach { row =>
      val dec = row.getAs[String]("decision")
      val llr = row.getAs[Long]("llr_micro")
      val nAt = row.getAs[Long]("n_at_decision")
      val n = row.getAs[Long]("n_trials")
      assert(row.getAs[Long]("n_success") <= n)
      assert(nAt <= n)
      dec match {
        case "accept_h1" => assert(llr >= bound, row.toString)
        case "accept_h0" => assert(llr <= -bound, row.toString)
        case "continue"  => assert(nAt === n && math.abs(llr) < bound,
          row.toString)
        case other => fail(s"unknown decision $other")
      }
    }
    // planted pure-success stream: every trial adds incS, so the walk
    // crosses +ln19 at EXACTLY ceil(bound/incS) trials — computable by
    // hand from the embedded constants (15 at the shipped p0/p1/α)
    import spark.implicits._
    val t0 = 1704067200L * 1000000000L
    def plant(tpe: String, perUser: Int): String = {
      val rows = (1 to 4).flatMap { u =>
        (1 to perUser).map(k =>
          (u * 1000L + k, t0 + (u * perUser + k) * 60_000_000_000L,
            u.toLong, tpe, 1.0, "{}"))
      }
      val dir = java.nio.file.Files.createTempDirectory("graftsprt").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val nS = (bound + incS - 1) / incS
    val up = SparkEntry.queries("q309_sprt")(spark, plant("purchase", 30))
      .collect()
    assert(up.nonEmpty)
    up.foreach { row =>
      assert(row.getAs[String]("decision") === "accept_h1", row.toString)
      assert(row.getAs[Long]("n_at_decision") === nS, row.toString)
      assert(row.getAs[Long]("llr_micro") === nS * incS, row.toString)
    }
    // planted pure-failure stream: crosses −ln19 at ceil(bound/|incF|)
    val nF = (bound + (-incF) - 1) / (-incF)
    val down = SparkEntry.queries("q309_sprt")(spark, plant("view", 70))
      .collect()
    assert(down.nonEmpty)
    down.foreach { row =>
      assert(row.getAs[String]("decision") === "accept_h0", row.toString)
      assert(row.getAs[Long]("n_at_decision") === nF, row.toString)
      assert(row.getAs[Long]("llr_micro") === nF * incF, row.toString)
    }
  }

  test("q276 delta-peel equals the full re-enumeration row for row") {
    // the swap-safety pin: the delta shape subtracts exactly the
    // triangles lost to each round's removals, so the two trajectories
    // (rounds, removals, alive counts, checksums) must be identical
    // q("q276_ktruss") resolves to ktrussDelta, so the reference shape
    // MUST be invoked directly — comparing the registry entry to itself
    // would pin nothing (advisor r12 finding)
    val full = operators.Graph.ktruss(spark, sf).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val delta = operators.Graph.ktrussDelta(spark, sf).orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(delta.toList === full.toList)
  }

  test("q276 k-truss: alive set monotone, constant after the first zero round; planted pendant triangle peels while K5 survives") {
    val rows = q("q276_ktruss").collect().sortBy(_.getInt(0))
    assert(rows.length === graft.operators.Graph.trussRounds)
    val alive = rows.map(_.getAs[Long]("n_alive"))
    alive.sliding(2).foreach { w => assert(w(1) <= w(0)) }
    val firstZero = rows.indexWhere(_.getAs[Long]("n_removed") === 0L)
    assert(firstZero >= 0, "must reach the fixpoint within the unroll")
    rows.drop(firstZero).foreach { r =>
      assert(r.getAs[Long]("n_removed") === 0L)
      assert(r.getAs[Long]("n_alive") === alive(firstZero))
    }
    // planted: K5 on parts 1–5 plus a pendant triangle (5,6,7); every edge
    // is two 2-part orders, so the repeat graph is exactly these edges.
    // K5 edges sit in 3 triangles each (4-truss members); the pendant
    // triangle's edges sit in exactly 1 → peeled in round 1, K5 intact.
    import spark.implicits._
    val edges = (for { u <- 1 to 5; v <- (u + 1) to 5 } yield (u, v)) ++
      Seq((5, 6), (5, 7), (6, 7))
    val li = edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((2L * i, u.toLong), (2L * i, v.toLong),
        (2L * i + 1, u.toLong), (2L * i + 1, v.toLong))
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("grafttruss").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q276_ktruss")(spark, dir).collect()
      .sortBy(_.getInt(0))
    assert(got(0).getAs[Long]("n_removed") === 3L)
    assert(got(0).getAs[Long]("n_alive") === 10L)
    assert(got(1).getAs[Long]("n_removed") === 0L)
    assert(got(1).getAs[Long]("n_alive") === 10L)
  }

  test("q267 Kaplan-Meier: survival monotone from 1e12, risk set strictly shrinking, events bounded by risk") {
    val rows = q("q267_kaplan_meier").collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Long]("survival_e12"))
    assert(s.head <= 1000000000000L && s.forall(_ >= 0L))
    s.sliding(2).foreach { w => assert(w(1) <= w(0), "survival must never rise") }
    val n = rows.map(_.getAs[Long]("n_at_risk"))
    n.sliding(2).foreach { w => assert(w(1) < w(0), "risk set strictly shrinks across event times") }
    rows.foreach(r => assert(r.getAs[Long]("n_events") >= 1L &&
      r.getAs[Long]("n_events") <= r.getAs[Long]("n_at_risk")))
  }

  test("q267 Kaplan-Meier: planted censored cohort reproduces the hand-computed curve exactly") {
    import spark.implicits._
    // A churns at t=10, B at t=20, C at t=0; D spans to the horizon and is
    // censored (leaves the risk set at 152 without an event):
    // S = 3/4, then 2/3 of that, then 1/2 of that — all exact in 1e12
    val orders = Seq(
      (1L, "2020-01-01"), (1L, "2020-01-11"),
      (2L, "2020-01-01"), (2L, "2020-01-21"),
      (3L, "2020-01-01"),
      (4L, "2020-01-01"), (4L, "2020-06-01"))
      .toDF("o_custkey", "o_orderdate")
    val dir = java.nio.file.Files.createTempDirectory("graftkm").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q267_kaplan_meier")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toList === List(
      (0L, 4L, 1L, 750000000000L),
      (10L, 3L, 1L, 500000000000L),
      (20L, 2L, 1L, 250000000000L)))
  }

  test("q266 assortativity: symmetric pair count, bounded r, matches the built-in corr estimator") {
    val r = q("q266_assortativity").collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n_pairs") === 2L * row.getAs[Long]("n_edges"),
      "symmetrization doubles the edge list exactly")
    val a = row.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
    // independent estimator: Spark's own corr over the same symmetrized
    // pairs — the exact-decimal formula must land within its round-4 grid
    val (edgeDir, _) = graft.operators.Graph.triArtifacts(spark, sf)
    val edges = spark.read.parquet(edgeDir)
    val deg = edges.select(col("u").as("x"))
      .union(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
    val builtin = sym.agg(corr("du", "dv")).collect()(0).getDouble(0)
    assert(math.abs(a - builtin) <= 2e-4,
      s"exact-decimal $a vs built-in corr $builtin")
  }

  test("q250 converged BFS: frontier trajectory positive until the final empty round") {
    val (out, traj) = operators.Graph.bfsConvergedRun(spark, sf)
    assert(traj.last == 0L, s"loop must end on an empty frontier: $traj")
    assert(traj.init.forall(_ > 0L),
      s"only the final frontier may be empty: $traj")
    // the realized hop profile covers exactly dists 0..R*-1 (+ the -1
    // unreached bucket): one row per non-empty frontier round
    val dists = out.collect().map(_.getInt(0)).sorted
    assert(dists.head == -1)
    assert(dists.tail.toSeq == (0 until traj.size - 1))
    // and the 3-hop contract query is the converged profile's prefix
    val fixed = q("q167_bfs_hops").collect()
      .map(r => (r.getInt(0), r.getLong(1))).filter { case (d, _) => d >= 0 }.toMap
    val conv = out.collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    fixed.foreach { case (d, n) =>
      assert(conv(d) == n, s"hop $d: fixed=$n converged=${conv(d)}")
    }
  }

  test("q251 converged LPA: changed-count positive until the final zero round; labels stable at the fixpoint") {
    val (out, traj) = operators.Graph.lpaConvergedRun(spark, sf)
    assert(traj.last == 0L, s"loop must end on a zero-change round: $traj")
    assert(traj.init.forall(_ > 0L),
      s"only the final round may change nothing: $traj")
    val rows = out.collect()
    // one trajectory row per executed round, rounds 1..R in order
    assert(rows.map(_.getInt(0)).toSeq == (1 to traj.size), rows.mkString(","))
    assert(rows.map(_.getLong(1)).toSeq == traj, rows.mkString(","))
    // the fixpoint certificate: the last two rounds agree on the label
    // population (same community count, same checksum)
    val (a, b) = (rows(rows.size - 2), rows(rows.size - 1))
    assert(a.getLong(2) == b.getLong(2) && a.getLong(3) == b.getLong(3),
      s"fixpoint rounds disagree: $a vs $b")
  }

  test("q252 converged k-core: removals positive until the final zero round; alive set monotone non-increasing") {
    val (out, traj) = operators.Graph.kcoreConvergedRun(spark, sf)
    assert(traj.last == 0L, s"loop must end on a zero-removal round: $traj")
    assert(traj.init.forall(_ > 0L),
      s"only the final round may remove nothing: $traj")
    val rows = out.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to traj.size), rows.mkString(","))
    rows.sliding(2).foreach {
      case Array(p, n) =>
        assert(n.getLong(2) <= p.getLong(2), s"alive grew: $p -> $n")
      case _ => ()
    }
    // the zero-removal round leaves the alive set (count AND checksum)
    // exactly where the previous round put it — the fixpoint certificate
    if (rows.size >= 2) {
      val (p, l) = (rows(rows.size - 2), rows(rows.size - 1))
      assert(p.getLong(2) == l.getLong(2) && p.getLong(3) == l.getLong(3),
        s"fixpoint rounds disagree: $p vs $l")
    }
  }

  test("q253 HyperBall: register lattice climbs monotonically to the fixpoint; final round is 100% of itself") {
    val (out, traj) = operators.Graph.hyperBallRun(spark, sf)
    assert(traj.last == 0L, s"loop must end on a zero-change round: $traj")
    assert(traj.init.forall(_ > 0L),
      s"only the final round may change nothing: $traj")
    val rows = out.collect()
    // rounds 0..R in order; per-loop-round changed counts match the output
    assert(rows.map(_.getInt(0)).toSeq == (0 to traj.size), rows.mkString(","))
    assert(rows.drop(1).map(_.getLong(1)).toSeq == traj, rows.mkString(","))
    // registers only grow (max-lattice): the checksum is non-decreasing,
    // and the final two rounds carry the identical bank
    rows.sliding(2).foreach {
      case Array(p, n) =>
        assert(n.getLong(2) >= p.getLong(2), s"register sum fell: $p -> $n")
      case _ => ()
    }
    assert(rows(rows.size - 2).getLong(2) == rows.last.getLong(2))
    // the trajectory is normalized to its own fixpoint
    assert(rows.last.getLong(4) == 1000000L, rows.last.toString)
    // every ball starts as {self}: N(0)'s small-range estimate must be
    // positive and no larger than later rounds' by more than the
    // documented sketch error (weak sanity, the oracle pins exact values)
    assert(rows.head.getLong(3) > 0, "round-0 estimate must be positive")
  }

  test("q253 HyperBall fidelity: the converged estimate lands within the m=64 sketch error of exact sum-of-squared-component-sizes") {
    import org.apache.spark.sql.functions._
    // at the fixpoint every node's ball IS its connected component, so
    // N(R) estimates Σ_c |c|² — computable exactly from the same staged
    // adjacency via the CC fixpoint. This pins the ESTIMATOR's fidelity
    // (not just engine parity): a wrong register-propagation rule that
    // both engines mirrored identically would pass the oracle but land
    // far outside the m=64 error band (σ ≈ 1.04/√64 = 13% per node).
    val (out, _) = operators.Graph.hyperBallRun(spark, sf)
    val nfFinal = out.collect().last.getLong(3)
    val ed = spark.read.parquet(
      operators.Graph.lpaEdgesDirForSpec(spark, sf))
    val nodes = ed.select(col("u").as("doc_id")).distinct()
    val labels = operators.Dedup.ccMinLabels(spark, nodes,
      ed.filter(col("u") < col("v"))
        .select(col("u").as("d1"), col("v").as("d2")))
    val exact = labels.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head().getLong(0)
    val ratio = nfFinal.toDouble / exact.toDouble
    assert(ratio > 0.75 && ratio < 1.25,
      s"estimate $nfFinal vs exact $exact (ratio $ratio)")
  }

  test("q258 harmonic centrality fidelity: estimated ranking tracks exact per-node BFS harmonic centrality") {
    import org.apache.spark.sql.functions._
    // exact H(v) = Σ_u 1/d(v,u) by per-node BFS over the sf0.001
    // adjacency (test-only collect: the fixture graph is tiny) — pins
    // the ESTIMATOR, not just engine parity, same argument as the q253
    // fidelity test. hc_num is lcm(1..24)-scaled, so exact comparison
    // divides by the same constant.
    val est = q("q258_harmonic_centrality").collect()
    assert(est.length == 10)
    val edges = spark.read.parquet(
        operators.Graph.lpaEdgesDirForSpec(spark, sf))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue))
    val adj = edges.groupBy(_._1).map { case (k, vs) =>
      (k, vs.map(_._2).distinct) }
    def exactH(src: Long): Double = {
      var frontier = Set(src); var seen = Set(src)
      var d = 0; var h = 0.0
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(adj.getOrElse(_, Array.empty[Long]))
          .diff(seen)
        h += next.size.toDouble / d
        seen ++= next; frontier = next
      }
      h
    }
    val exact = adj.keys.map(v => (v, exactH(v))).toVector
      .sortBy { case (v, h) => (-h, v) }
    val exactTop = exact.take(10).map(_._1).toSet
    val overlap = est.map(_.getAs[Number](0).longValue)
      .count(exactTop.contains)
    // measured at sf0.001: overlap 10/10; pinned with slack for the
    // m=64 sketch band
    assert(overlap >= 6, s"estimated top-10 shares only $overlap with exact")
    // every reported hc_num lands within the sketch error of its exact H
    val exactByNode = exact.toMap
    est.foreach { r =>
      val node = r.getAs[Number](0).longValue
      val hEst = r.getLong(1).toDouble / operators.Graph.hbHarmonicLcm
      val hTrue = exactByNode(node)
      val ratio = hEst / hTrue
      assert(ratio > 0.6 && ratio < 1.4,
        s"node $node: estimated H $hEst vs exact $hTrue (ratio $ratio)")
    }
  }

  test("q255 incremental CC: a planted delta basket BRIDGES two base components; a delta-only node attaches") {
    import spark.implicits._
    // base: orders 1,2 build edge (1,2); orders 4,5 build edge (5,6);
    // orders 6,7 build edge (8,9). delta (o ≡ 3 mod 20): orders 3,23
    // both hold {2,5} → NEW edge (2,5) bridging {1,2}∪{5,6}; orders
    // 43,63 both hold {9,11} → NEW edge (9,11) attaching the unseen
    // node 11 to {8,9}. Expected components: {1,2,5,6} and {8,9,11}.
    val items = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (4L, 5L), (4L, 6L), (5L, 5L), (5L, 6L),
      (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L),
      (3L, 2L), (3L, 5L), (23L, 2L), (23L, 5L),
      (43L, 9L), (43L, 11L), (63L, 9L), (63L, 11L))
    val dir = java.nio.file.Files.createTempDirectory("graftinccc").toString
    items.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q255_incremental_cc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toList === List(
      (1L, 4L, 1L, 14L),   // bridged: 1+2+5+6
      (8L, 3L, 8L, 28L)),  // attached: 8+9+11
      rows.mkString(","))
  }

  test("q261 personalized PageRank: rank localizes on the seed neighborhood") {
    val rows = q("q261_personalized_pagerank").collect()
    assert(rows.length == 10)
    val prs = rows.map(_.getLong(1))
    assert(prs.sameElements(prs.sortBy(-_)), prs.mkString(","))
    // parts are never seeds, so every unit of rank they hold walked there
    assert(prs.forall(_ > 0L), prs.mkString(","))
    // localization: all top-10 parts sit DIRECTLY in the seed nation's
    // baskets (two-hop mass pays 0.85^2 attenuation plus two degree
    // divisions — it never outruns a direct seed purchase; verified to
    // hold at sf0.001/0.01/0.1 before pinning)
    val seedParts = {
      val seeds = graft.sources.Tables.orders(spark, sf)
        .join(graft.sources.Tables.customer(spark, sf)
            .filter(col("c_nationkey") === graft.operators.Graph.pprSeedNation)
            .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
      graft.sources.Tables.lineitem(spark, sf)
        .join(seeds, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey")).distinct()
        .collect().map(_.getLong(0)).toSet
    }
    assert(rows.forall(r => seedParts.contains(r.getLong(0))),
      rows.map(_.getLong(0)).filterNot(seedParts.contains).mkString(","))
  }

  test("q262 HITS: both sides top-10, renormalized argmax pinned to the fixed-point window") {
    val rows = q("q262_hits").collect()
    val (auths, hubs) = rows.partition(_.getString(0) == "authority")
    assert(auths.length == 10 && hubs.length == 10, rows.length.toString)
    for (side <- Seq(auths, hubs)) {
      val scores = side.map(_.getLong(2))
      assert(scores.sameElements(scores.sortBy(-_)), scores.mkString(","))
      assert(scores.forall(_ > 0L), scores.mkString(","))
      // the argmax node renormalizes to [1e6, 2e6): floor(max/(floor(max/1e6)))
      assert(scores.head >= 1000000L && scores.head < 2000000L, scores.head.toString)
    }
  }
}
