package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Host-load stamp: three consecutive rounds (r9 q121/q122, r10
    // q28/q72/q94, r11 ten movers) burned a judge median-of-5 adjudication
    // cycle proving driver-bench drift was ambient host load. Reading
    // /proc/loadavg at session start AND end settles that at read time:
    // a record taken at load1 > ~2 is annotated, not adjudicated (the
    // SURVEY §6 convention). -1.0 = unreadable (non-Linux), never a crash.
    def load1(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadBefore = load1()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet is TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native vec_dot/vec_sqnorm expressions (graft.functions.VecExprs)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // 80+ queries in one session accumulate dead broadcasts, shuffle
      // files and checkpoint blocks that the ContextCleaner only reclaims
      // after a GC notices them; the default periodic GC (30 min) never
      // fires inside a bench run, so late queries pay the debris as heap
      // pressure. One forced GC a minute keeps the session flat.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fail loudly ONCE on fixture drift before benching into it (see
    // Tables.smokeCheck; r7's re-encoded ts column produced 35 repeated
    // error strings that blew the harness's JSON parse window).
    graft.sources.Tables.smokeCheck(spark, sfDir)
    // Untimed warm-up: JIT, codegen compiler, parquet reader and spark.ml
    // (breeze/BLAS) initialization would otherwise all be attributed to
    // whichever query happens to iterate first (measured ~5s on the first
    // query of a cold session).
    SparkEntry.entry(spark).count();
    {
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.feature.VectorAssembler
      import spark.implicits._
      val tiny = new VectorAssembler().setInputCols(Array("x")).setOutputCol("features")
        .transform((0 until 64).map(i => (i.toDouble, i % 2)).toDF("x", "label"))
      new LogisticRegression().setMaxIter(2).fit(tiny).transform(tiny).count()
    }
    // Sorted name order: Map iteration order is arbitrary and changes with
    // the key set, which made round-over-round per-query diffs attribute
    // warm-up/GC noise to whichever query happened to move.
    // Materialize through the noop sink, not count(): count() lets the
    // optimizer delete provably-cardinality-neutral subtrees — a left join
    // against a grouped (unique-key) right side drops the ENTIRE right
    // subtree, so a query like the minhash-dedup verdict would "run" in the
    // time of a bare table count. The noop sink evaluates every output row
    // and column and discards them — the cost of the real query, minus sink
    // I/O.
    // Optional comma-separated query-name filter (substring match) for
    // iterating on one query's timing without paying the full suite. Blank
    // tokens (a stray comma) would substring-match EVERY name, silently
    // disabling the filter — drop them; an all-blank value means no filter.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    // Variance discipline: SPARK_GRAFT_REPEATS=N runs each query N times
    // and reports the MEDIAN (lower-middle — deterministic for even N) as
    // the headline number plus the min alongside. A single-shot timing on
    // a shared host cannot distinguish a 2× regression from a neighbor's
    // compile job; the median of 5 can. Default stays 1 — the driver's
    // recorded run is untouched — and the per-query mins map is emitted
    // only when N > 1 so the one-line JSON stays inside the ~2000-char
    // window the harness records on full-suite runs.
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS")
      .map(_.trim.toInt).filter(_ >= 1).getOrElse(1)
    val results = selected.map { case (name, fn) =>
      val runs = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        val err = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None
        } catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n')) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val ok = runs.collect { case (t, None) => t }.sorted
      val median = if (ok.nonEmpty) ok((ok.size - 1) / 2) else runs.head._1
      val min = if (ok.nonEmpty) ok.head else runs.head._1
      (name, median, min, runs.collectFirst { case (_, Some(e)) => e })
    }
    // ms precision, Locale.ROOT: a wall-clock timing carries no more than
    // 3 digits, and 9-digit doubles pushed the line past the ~2000-char
    // output window the harness records (every BENCH_r1..r5 came back
    // "parsed": null — the line was truncated mid-JSON).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Short qNN keys for the same reason (the contract example uses "q1");
    // the full name is the SparkEntry.queries key with that prefix. Two
    // names sharing a prefix would silently emit a duplicate JSON key and
    // lose a timing — fail instead.
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN prefixes: ${prefixes.diff(prefixes.distinct).mkString(",")}")
    val qs = results.map { case (k, v, _, _) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // A failed query must surface as a failure, not as a fast timing line —
    // but bounded: r7's 35 full exception strings blew the ~2000-char
    // window the harness parses and zeroed the round's timings
    // ("parsed": null), the exact failure mode the fmt() comment documents.
    // Truncate each message to 80 chars, emit at most 8 entries, and fold
    // the overflow into a single "_more" count so a systemic failure reads
    // as one line instead of eating the JSON.
    val failed = results.collect { case (k, _, _, Some(e)) => (k, e.take(80)) }
    val errs = (failed.take(8).map { case (k, e) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    } ++ (if (failed.size > 8) Seq(s""""_more":${failed.size - 8}""") else Nil))
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, None) => v }.sum
    val minsJson = if (repeats > 1) {
      val ms = results.map { case (k, _, mn, _) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + fmt(mn)
      }.mkString("{", ",", "}")
      s""","mins":$ms""" // repeats itself now rides the always-on load stamp
    } else ""
    // Record the active filter: a filtered run saved as BENCH_rNN.json must
    // be distinguishable from a full-suite run. Escaped like the errors
    // map — a stray quote in the env var must not corrupt the one JSON
    // line the harness parses.
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val onlyJson = only.map(o => s""","only":"${esc(o.mkString(","))}"""").getOrElse("")
    // The stamp rides BOTH emitted lines (compact + detail) so whichever
    // artifact a reader holds self-adjudicates; repeats is always present
    // (1 = the driver's single-shot convention) so a median-of-N record
    // is distinguishable without consulting the mins map.
    val loadAfter = load1()
    val loadJson =
      s""","load1_before":${fmt(loadBefore)},"load1_after":${fmt(loadAfter)},"repeats":$repeats"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errs$onlyJson$minsJson$loadJson,"sf":"${esc(sfDir)}"}"""
    // The full line (233 timings ≈ 3.4k chars) overflows the ~2000-char
    // stdout tail window the harness records — BENCH_r07 and r08 both came
    // back "parsed": null despite clean runs. Persist the full map to a
    // file, print the full line for local logs, then print a COMPACT
    // summary (~150 chars, guaranteed inside the window) as the FINAL
    // stdout line so the driver's parse always lands on a complete JSON
    // object with the total, query count, and error count.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), fullLine + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    // stderr, not stdout: a consumer selecting by "metric":"total" instead
    // of taking the final stdout line would otherwise match TWO records
    // (this full line and the compact summary below). Exactly one "total"
    // record appears on stdout; the full map still reaches local logs via
    // stderr and durable storage via detailPath.
    System.err.println(fullLine)
    // detailPath and sfDir are env-controlled: escape them like `only`
    // above, or a quote/backslash in either path re-breaks the final
    // guaranteed-parseable line this split exists to protect.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"errors":${failed.size}$loadJson,"detail":"${esc(detailPath)}","sf":"${esc(sfDir)}"}""")
    spark.stop()
    // Explicit exit after the one JSON line is printed — see Verify.main:
    // a leaked non-daemon thread must not stall the harness on process
    // exit when the measurement is already on stdout.
    sys.exit(0)
  }
}
