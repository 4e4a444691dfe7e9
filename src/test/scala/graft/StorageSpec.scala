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

  test("q135 zone map genuinely skips files: pruned list is a proper non-empty subset") {
    val (out, dataDir) = graft.operators.Storage.zoneMapRun(spark, sf)
    out.collect() // materialize: the layout write happens eagerly anyway
    val (total, kept) = graft.operators.Storage
      .zoneMapPlan(spark, dataDir, "1995-06-01", "1996-06-01")
    assert(total === 8, s"expected the 8 range-clustered files, got $total")
    assert(kept > 0, "probe interval must intersect at least one file span")
    assert(kept < total,
      s"zone map must SKIP files on a narrow probe ($kept of $total read)")
  }

  test("q268 deletion vectors: merge-on-read leaves tombstones ON DISK while the read excludes them; DV probe is broadcast") {
    val (root, rep) = graft.operators.Storage.dvRun(spark, sf)
    val plan = rep.queryExecution.executedPlan.toString
    // the DV attach is a broadcast of metadata-sized bitmaps, never a
    // shuffled join — the entire point of the merge-on-read trade
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val rows = rep.collect()
    assert(rows.length === 8)
    // the base layout is NOT rewritten: tombstoned rows are still present
    // in the files the report just read (q248's copy-on-write is the
    // contrast — there the spec pins them GONE from rewritten buckets)
    val onDisk = spark.read.parquet(root)
    val tombOnDisk = onDisk.filter(col("doc_id") % 53 === 17).count()
    assert(tombOnDisk > 0, "fixture must contain tombstoned rows")
    assert(rows.map(_.getAs[Long]("n_deleted")).sum === tombOnDisk)
    // the live checksum equals the direct all-minus-tombstones sum
    val direct = onDisk.filter(!(col("doc_id") % 53 === 17))
      .agg(sum("doc_id")).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("live_id_checksum")).sum === direct)
  }

  test("q260 clustering depth: the clustered layout separates cleanly from the hashed one on every metric") {
    val rows = q("q260_clustering_depth").collect()
      .map(r => r.getString(0) -> r).toMap
    val (c, h) = (rows("clustered"), rows("hashed"))
    assert(c.getLong(1) === 8L && h.getLong(1) === 8L, rows.toString)
    // equi-width date buckets: spans tile the domain — zero overlapping
    // pairs, depth 1; the hash layout is the degenerate opposite: every
    // bucket spans (nearly) the whole domain, all pairs overlap, full
    // stabbing depth
    assert(c.getLong(2) === 0L, s"clustered overlap_pairs: $c")
    assert(c.getLong(3) === 1L, s"clustered max_depth: $c")
    assert(h.getLong(2) === 28L, s"hashed overlap_pairs: $h")
    assert(h.getLong(3) === 8L, s"hashed max_depth: $h")
    assert(c.getLong(4) < h.getLong(4),
      s"clustered sum_span must undercut hashed: $c vs $h")
  }

  test("q157 bloom skip: candidate files cover every true file and still prune") {
    val (out, allFiles, candFiles, trueFiles) =
      graft.operators.Storage.bloomSkipRun(spark, sf)
    assert(allFiles.size === 8, s"expected 8 time slices, got ${allFiles.size}")
    // no false negatives: every file actually holding a probe key is a
    // candidate — this is the property that makes the pruned read exact
    assert(trueFiles.toSet.subsetOf(candFiles.toSet),
      s"bloom missed files: ${trueFiles.toSet -- candFiles.toSet}")
    // and the index genuinely skips: candidates are a proper subset
    assert(candFiles.size < allFiles.size,
      s"bloom must SKIP files (${candFiles.size} of ${allFiles.size} read)")
    // the pruned read returns all 5 probe keys with positive counts
    val rows = out.collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Long]("n_rows") > 0))
  }

  test("q163 partition digest: detects a one-row mutation in exactly the touched group") {
    val base = graft.SparkEntry.queries("q163_partition_digest")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replica with ONE l_quantity flipped in one flag group
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val victim = li.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber").head()
    val (vo, vl) = (victim.getLong(0), victim.getInt(1))
    val mutated = li.withColumn("l_quantity",
      when(col("l_orderkey") === vo && col("l_linenumber") === vl,
        col("l_quantity") + 1).otherwise(col("l_quantity")))
    val dir = java.nio.file.Files.createTempDirectory("graftdigest").toString
    mutated.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.SparkEntry.queries("q163_partition_digest")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === base.keySet)
    got.foreach { case (flag, (n, dg)) =>
      assert(n === base(flag)._1, s"row counts must agree ($flag)")
      if (flag == "R") assert(dg !== base(flag)._2, "mutation must change R's digest")
      else assert(dg === base(flag)._2, s"untouched group $flag must keep its digest")
    }
  }

  test("q166 encoding advisor: low-cardinality keys read dict, near-unique values read plain") {
    val rows = graft.SparkEntry.queries("q166_encoding_advisor")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    val (n, ndvRf, top1Rf, hRf, advRf) = rows("l_returnflag")
    assert(advRf === "dict" && ndvRf <= 3L)
    // entropy can never exceed ln(ndv) µnats; top-1 share at least 1/ndv
    assert(hRf <= math.round(math.log(ndvRf.toDouble) * 1e6))
    assert(top1Rf >= 1000000L / ndvRf)
    val (_, ndvEp, _, hEp, advEp) = rows("l_extendedprice")
    assert(advEp === "plain", s"near-unique column must read plain (ndv=$ndvEp of $n)")
    assert(hEp > hRf, "high-cardinality entropy must exceed the 3-value key's")
  }

  test("q134 time travel: version-2 read sees exactly the first two batches") {
    val (out, dataDir) = graft.operators.Storage.timeTravelRun(spark, sf)
    val asOfV2 = out.collect().map(_.getLong(1)).sum
    val o = graft.sources.Tables.orders(spark, sf)
    assert(asOfV2 === o.filter(col("o_orderdate") < "1997-01-01").count())
    // and the LIVE dir holds all three batches — the version isolation is
    // the manifest, not the data layout
    assert(spark.read.parquet(dataDir).count() === o.count())
  }

  test("z-ordered files keep BOTH clustered columns' per-file spans narrow") {
    val dir = graft.operators.Storage.zorderWrite(spark, sf)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("l_partkey") - min("l_partkey")).as("pspan"),
        (max("l_suppkey") - min("l_suppkey")).as("sspan"))
      .agg(avg("pspan").as("p"), avg("sspan").as("s"),
        count(lit(1)).as("files"))
      .head()
    val (pGlobal, sGlobal) = {
      val r = graft.sources.Tables.lineitem(spark, sf)
        .agg(max("l_partkey") - min("l_partkey"),
          max("l_suppkey") - min("l_suppkey")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    assert(spans.getLong(2) > 1, "layout must produce multiple files")
    // a random layout would put ~the full domain in every file; the curve
    // must keep the average per-file span well under it on BOTH dimensions
    assert(spans.getDouble(0) < pGlobal * 0.7,
      s"partkey span ${spans.getDouble(0)} vs global $pGlobal")
    assert(spans.getDouble(1) < sGlobal * 0.7,
      s"suppkey span ${spans.getDouble(1)} vs global $sGlobal")
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

  test("q197 backfill gaps: missing days group into contiguous islands; present days never surface") {
    import spark.implicits._
    // present: Jan 1-3, 6, 8 → gaps (4-5) and (7)
    val days = Seq("1995-01-01", "1995-01-02", "1995-01-03",
      "1995-01-06", "1995-01-08")
    val dir = java.nio.file.Files.createTempDirectory("graftgap").toString
    days.zipWithIndex.map { case (day, i) =>
      (i.toLong, i.toLong, "O", 1.0,
        java.sql.Timestamp.valueOf(s"$day 00:00:00"), "X")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q197_backfill_gaps")(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("gap_start").toString,
        r.getAs[java.sql.Date]("gap_end").toString, r.getAs[Long]("n_days")))
    assert(got.toList === List(
      ("1995-01-04", "1995-01-05", 2L), ("1995-01-07", "1995-01-07", 1L)),
      got.mkString(","))
  }

  test("q182 rendezvous resize: engine matches the closed-form HRW/mod arithmetic; HRW moves a fraction of what mod moves") {
    import spark.implicits._
    val n = 500
    val dir = java.nio.file.Files.createTempDirectory("grafthrw").toString
    (0 until n).map(i => (i.toLong, s"d$i", "en", "s", 2))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // independent reimplementation of the mix in plain Scala
    def hrw(doc: Long, shards: Int): Long =
      (0 until shards).map { sIdx =>
        ((doc + sIdx * 1000003L) * 2654435761L) % 4294967296L * 16L + sIdx
      }.max % 16L
    def h(doc: Long): Long = (doc * 2654435761L) % 4294967296L
    val expHrwMoved = (0 until n).count(i => hrw(i, 8) != hrw(i, 10)).toLong
    val expModMoved = (0 until n).count(i => h(i) % 8 != h(i) % 10).toLong
    val got = SparkEntry.queries("q182_rendezvous_resize")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_moved")))).toMap
    assert(got("rendezvous") === ((n.toLong, expHrwMoved)), got.toString)
    assert(got("mod") === ((n.toLong, expModMoved)), got.toString)
    // the audit's whole point: rendezvous rebalance moves FAR less data
    assert(expHrwMoved * 2 < expModMoved,
      s"hrw=$expHrwMoved mod=$expModMoved")
  }

  test("q206 gc audit: orphans are exactly the rewritten batch; the live manifest reaches the whole table") {
    val r = SparkEntry.queries("q206_gc_audit")(spark, sf).head()
    val orders = graft.sources.Tables.orders(spark, sf)
    val total = orders.count()
    val batch1 = orders
      .filter(org.apache.spark.sql.functions.col("o_orderdate") < "1997-01-01")
      .count()
    assert((r.getAs[Long]("n_files_disk"), r.getAs[Long]("n_files_live"),
      r.getAs[Long]("n_orphans")) === ((5L, 3L, 2L)), r.toString)
    assert(r.getAs[Long]("rows_live") === total, r.toString)
    assert(r.getAs[Long]("rows_orphan") === batch1, r.toString)
  }

  test("q211 repair plan: the drifted partition alone flags, with the exact row delta") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 10.0, "1-URGENT"), (500L, 2L, 20.0, "1-URGENT"),
      (500L, 3L, 30.0, "3-MEDIUM"), (1000L, 4L, 40.0, "3-MEDIUM"),
      (7L, 5L, 50.0, "3-MEDIUM"))
    val dir = java.nio.file.Files.createTempDirectory("graftrepair").toString
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q211_repair_plan")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("rows_a"),
        r.getAs[Long]("rows_b"), r.getAs[Boolean]("needs_repair"),
        r.getAs[Long]("row_delta")))).toMap
    assert(got("1-URGENT") === ((2L, 2L, false, 0L)), got.toString)
    assert(got("3-MEDIUM") === ((3L, 1L, true, 2L)), got.toString)
  }

  test("q221 incremental refresh: merged partials equal the direct full aggregate") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q221_incremental_refresh")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    val want = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    assert(got === want, s"merge != recompute: $got vs $want")
  }

  test("q227 schema drift: added, removed, retyped, and unchanged columns classify exactly") {
    val got = SparkEntry.queries("q227_schema_drift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(got.toList === List(
      ("o_custkey", "bigint", "-", "removed"),
      ("o_orderkey", "bigint", "bigint", "unchanged"),
      ("o_orderpriority", "-", "string", "added"),
      ("o_totalprice", "double", "decimal(18,2)", "retyped")),
      got.mkString(","))
  }

  test("q248 RTBF delete: untouched files stay byte-identical; rewrites touch only affected buckets") {
    val (out, md5Before, untouched) =
      operators.Dedup.rtbfRun(spark, sf, withChecksums = true)
    val row = out.collect()(0)
    // the copy-on-write contract: files outside the tombstones' buckets
    // are never opened, never rewritten — their bytes cannot change
    assert(untouched.nonEmpty, "fixture must leave untouched files")
    untouched.foreach { p =>
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(p))
      val bytes = try in.readAllBytes() finally in.close()
      val after = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      assert(after === md5Before(p), s"untouched file mutated: $p")
    }
    // row math: deletes fully propagate, nothing else is lost
    val (before, tomb, afterN) =
      (row.getAs[Long]("n_docs_before"), row.getAs[Long]("n_tombstones"),
        row.getAs[Long]("n_docs_after"))
    assert(afterN === before - tomb)
    assert(row.getAs[Long]("n_label_refs_after") === 0L)
    assert(row.getAs[Long]("n_posting_refs_after") === 0L)
    assert(row.getAs[Long]("n_files_untouched") === untouched.size.toLong)
  }

  test("q281 Merkle law: mismatched leaves are exactly the changed keys' buckets, and every dirty leaf's ancestors mismatch") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // recompute the planted change set the operator's own way: the 12
    // md5-ranked order keys (6 repriced, 6 deleted — all 12 change their
    // bucket's content, since cents*21 div 20 <> cents for cents >= 100)
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val changed = keys.sortBy(k => (md5hex(k.toString), k)).take(12)
    val leaves = changed.map(_ % 256L).toSet
    val mids = leaves.map(_ / 16L)
    val expect = leaves.map(n => (0, n)) ++ mids.map(n => (1, n)) + ((2, 0L))
    val got = q("q281_merkle_diff").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got === expect, s"got $got expected $expect")
    // and the diff genuinely localized: dirty nodes are a strict
    // minority of the tree's 273
    assert(got.size < 40)
  }

  test("q295 incremental Merkle maintenance agrees with q281's from-scratch diff node for node") {
    // the maintained tree's dirty rows must be EXACTLY q281's mismatch
    // worklist — same nodes, same old/new digests and row counts — and
    // clean rows must carry digest_new == digest_old (the delta update
    // never perturbs untouched subtrees)
    val maintained = q("q295_merkle_maintain").collect()
    val dirty = maintained.filter(_.getAs[Boolean]("dirty"))
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Long]("digest_old"),
        r.getAs[Long]("digest_new"), r.getAs[Long]("n_rows_old"),
        r.getAs[Long]("n_rows_new"))).toSet
    val diff = q("q281_merkle_diff").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Long]("digest_a"),
        r.getAs[Long]("digest_b"), r.getAs[Long]("n_rows_a"),
        r.getAs[Long]("n_rows_b"))).toSet
    assert(dirty === diff, s"dirty $dirty vs diff $diff")
    maintained.filterNot(_.getAs[Boolean]("dirty")).foreach { r =>
      assert(r.getAs[Long]("digest_new") === r.getAs[Long]("digest_old"))
      assert(r.getAs[Long]("n_rows_new") === r.getAs[Long]("n_rows_old"))
    }
    // the full tree is present (every stored node reported, 256+16+1)
    assert(maintained.length === 273)
  }

  test("q314 Hilbert audit: the generated expression IS a Hilbert curve; the fixture manifest favors it over Morton") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // the generated arithmetic, evaluated over the whole 8×8 grid, must
    // be a bijection onto 0..63 whose consecutive codes are exactly one
    // grid step apart — the defining Hilbert property (Morton fails it:
    // z = 7 → 8 jumps (3,3) → (0,4))
    val cells = (for { x <- 0 until 8; y <- 0 until 8 } yield (x, y))
      .toDF("pb", "sb")
    val codes = cells.select(col("pb"), col("sb"),
      expr(graft.operators.Storage.hilbertExpr("div")).as("h")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[Number]("h").longValue))
    assert(codes.map(_._3).sorted.toList === (0L until 64L).toList)
    val byD = codes.map(c => c._3 -> (c._1, c._2)).toMap
    (0L until 63L).foreach { dd =>
      val (x1, y1) = byD(dd); val (x2, y2) = byD(dd + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1, s"jump at $dd")
    }
    // fixture manifest: both layouts account for every row, and the
    // 6-cell packing shows Hilbert's compactness — total span strictly
    // under Morton's, worst file never ripping the s-dimension open
    val r = q("q314_hilbert_audit").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.size === 2)
    val (h, m) = (r("hilbert"), r("morton"))
    assert(h.getAs[Long]("n_rows") === m.getAs[Long]("n_rows"))
    assert(h.getAs[Long]("n_rows") ===
      graft.sources.Tables.lineitem(spark, sf).count())
    assert(h.getAs[Long]("sum_pspan") + h.getAs[Long]("sum_sspan") <
      m.getAs[Long]("sum_pspan") + m.getAs[Long]("sum_sspan"))
    assert(h.getAs[Long]("worst_sspan") <= m.getAs[Long]("worst_sspan"))
  }
}
