package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the corpus-preparation operators (operators/Pipeline):
  * invariants that must hold on ANY input, checked on the sf0.001 fixtures.
  * Value-level parity with DuckDB is the Verify gate's job.
  */
class PipelineSpec extends SparkSpec {

  test("q84 source cap: never more than 5 docs per source, rn dense from 1") {
    val rows = q("q84_source_cap").collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 5, src)
      assert(rs.map(_.getInt(2)).sorted.toSeq === (1 to rs.length), src)
    }
  }

  test("q85 packing: bins partition each lang's docs; no bin starts beyond budget") {
    val rows = q("q85_pack_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc counts per lang must sum to the corpus per-lang counts
    val packed = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val corpus = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed === corpus)
    // every bin except possibly a lang's last holds >= 2048 cumulative
    // tokens by construction of the running-total bin id, so bin ids are
    // contiguous from 0
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val bins = rs.map(_._2).sorted
      assert(bins.toSeq === (0L until bins.length).toSeq, lang)
    }
  }

  test("q87 repetition: ratio in [0,1); distinct <= total trigrams") {
    q("q87_repetition").collect().foreach { r =>
      val (total, distinct, ratio) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(distinct <= total)
      assert(ratio >= 0.0 && ratio < 1.0)
      if (total > 0)
        assert(math.abs(ratio - (1.0 - distinct.toDouble / total)) < 1e-6)
    }
  }

  test("q88 z-scores: outliers are a small minority and bounds bracket zero") {
    q("q88_zscore_outliers").collect().foreach { r =>
      val (n, out, minZ, maxZ) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(out < n / 4, "more than a quarter outliers")
      assert(minZ < 0 && maxZ > 0, "both tails present")
    }
  }

  test("q103 temperature mix: quotas within budget, realized exactly, low-resource upsampled") {
    val rows = q("q103_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // quota is always realizable and realized exactly (hash rank is total)
    rows.foreach { case (lang, nDocs, quota, sampled) =>
      assert(quota <= nDocs, lang)
      assert(sampled === quota, lang)
    }
    // integer-division quotas never exceed the budget
    assert(rows.map(_._3).sum <= 200L)
    // α = 0.5 upsamples low-resource languages: the smallest language's
    // sampling fraction is >= the largest's
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    if (smallest._2 < largest._2)
      assert(smallest._3.toDouble / smallest._2 >= largest._3.toDouble / largest._2)
  }

  test("q293 curriculum: difficulty ceiling ramps monotonically, counts expand, and epoch 3 realizes every source quota exactly") {
    val rows = q("q293_curriculum").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(1, 2, 3))
    // law 1: the expanding-window ramp — each epoch's max difficulty is
    // >= the previous epoch's (epoch e trains on tiers 1..e)
    val ceiling = (1 to 3).map(e => byEpoch(e).map(_._5).max)
    assert(ceiling(0) <= ceiling(1) && ceiling(1) <= ceiling(2),
      s"ramp broke: $ceiling")
    // law 2: conservation — epoch 3 is the full selection, so every
    // source's count equals its quota exactly, and the total stays
    // within the budget
    byEpoch(3).foreach { case (_, src, n, quota, _) =>
      assert(n === quota, s"$src: $n != quota $quota")
    }
    assert(byEpoch(3).map(_._3).sum <= 300L)
    // per-source counts never shrink as the window expands
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      val n = (1 to 3).map(e => rs.find(_._1 == e).map(_._3).getOrElse(0L))
      assert(n(0) <= n(1) && n(1) <= n(2), s"$src: $n")
    }
  }

  test("q296 domain reweighting: every round's ledger sums to exactly 1e6 ppm; the hardest domain rises monotonically, zero-excess domains decay") {
    val rows = q("q296_domain_reweight").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getAs[Long]("excess_micro"),
        r.getAs[Long]("weight_ppm")))
    val byRound = rows.groupBy(_._1)
    assert(byRound.keySet === (1 to 5).toSet)
    // conservation: exact 1e6 per round (the q292 closed-ledger rule)
    byRound.foreach { case (r, rs) =>
      assert(rs.map(_._4).sum === 1000000L, s"round $r leaks")
    }
    // the max-excess domain gains weight every round; zero-excess
    // domains never gain (they only lose share to the risers)
    val hardest = rows.filter(_._1 == 1).maxBy(_._3)._2
    val hw = (1 to 5).map(r => byRound(r).find(_._2 == hardest).get._4)
    hw.sliding(2).foreach { w => assert(w(1) >= w(0), s"hardest: $hw") }
    val easy = rows.filter(r => r._1 == 1 && r._3 == 0L).map(_._2)
    if (easy.nonEmpty) {
      val hasRiser = rows.filter(_._1 == 1).exists(_._3 > 0L)
      easy.foreach { src =>
        val w = (1 to 5).map(r => byRound(r).find(_._2 == src).get._4)
        // remainder assignment can add ±1 ppm; allow that quantum only
        w.sliding(2).foreach { p =>
          if (hasRiser) assert(p(1) <= p(0) + 1, s"$src: $w")
        }
      }
    }
  }

  test("q310 DSIR: sources partition the corpus and the ledger is internally consistent; a planted disjoint-vocabulary corpus separates perfectly") {
    val rows = q("q310_dsir_weights").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_selected"), r.getAs[Long]("sel_ppm"),
        r.getAs[Long]("mean_w_micro")))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum ===
      graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { case (src, nd, ns, ppm, _) =>
      assert(ns >= 0 && ns <= nd, src)
      assert(ppm === ns * 1000000L / nd, src)
    }
    // planted separation: en docs draw from one vocabulary, zh docs from
    // a disjoint one. Every en-exclusive bucket's log ratio is
    // ln((Nr+B)/(Nt+B)) > 0 and every zh-exclusive bucket's is negative
    // (its target count is 0 while its raw count dwarfs the smoothing),
    // so DSIR must select ALL of the en source and NONE of the zh one
    import spark.implicits._
    val docs =
      (0 until 10).map { i =>
        (i.toLong, Seq.fill(25)("aqua brim").mkString(" "), "en", "s_en", 100L)
      } ++ (0 until 10).map { i =>
        (100L + i, Seq.fill(25)("zeta yot").mkString(" "), "zh", "s_zh", 100L)
      }
    val dir = java.nio.file.Files.createTempDirectory("graftdsir").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q310_dsir_weights")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_selected"), r.getAs[Long]("mean_w_micro"))).toMap
    assert(got("s_en") === ((10L, 10L, got("s_en")._3)) &&
      got("s_en")._3 > 0L, got.toString)
    assert(got("s_zh") === ((10L, 0L, got("s_zh")._3)) &&
      got("s_zh")._3 < 0L, got.toString)
  }

  test("q89 stratified sample keeps roughly 10% per stratum") {
    q("q89_stratified_sample").collect().foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= n)
      // md5 buckets: binomial(n, 0.1) — very loose band, just not 0% or 50%
      if (n >= 50) assert(kept > 0 && kept < n / 2, s"kept=$kept of $n")
    }
  }

  test("q90 chunks: lengths reassemble to n_chars; all but last chunk are 500") {
    val byDoc = q("q90_chunk500").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    val lens = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._3.toLong).sum === lens(doc), s"doc $doc")
      sorted.init.foreach(c => assert(c._3 === 500, s"doc $doc chunk ${c._2}"))
    }
  }

  test("q90 chunking yields zero chunks for an empty document") {
    // sequence(0, n-1) descends to [0, -1] when n = 0 — the guard must
    // make an empty doc produce NO chunks (oracle range(0, 0) is empty)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftdocs90").toString
    Seq((1L, "", "en", "t", 0L), (2L, "abc", "en", "t", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q90_chunk500")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L))
    assert(rows.head.getInt(2) === 3)
  }

  test("q83 redaction: every doc's synthetic email and phone digits are masked") {
    q("q83_pii_redact").collect().foreach { r =>
      assert(r.getInt(1) >= 1, "email seen")  // n_emails
      assert(r.getInt(2) >= 1, "digit run seen") // n_nums
      assert(r.getInt(4) > 0, "redaction shortened the text") // len_delta
    }
  }

  test("q91 latest per key: one row per (user, type); ts is the key's max") {
    val rows = q("q91_latest_per_key").collect()
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    val maxTs = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(max("ts").as("m")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getTimestamp(2)).toMap
    rows.foreach(r =>
      assert(r.getTimestamp(3) === maxTs((r.getLong(0), r.getString(1)))))
  }

  test("q92 dq audit: fixture batch passes every constraint") {
    val rows = q("q92_dq_audit").collect()
    assert(rows.length === 5)
    rows.foreach(r => assert(r.getBoolean(2), r.getString(0)))
  }

  test("q127 negatives are genuinely negative: kept ids never intersect the positive set") {
    import org.apache.spark.sql.functions._
    val pos = graft.sources.Tables.orders(spark, sf)
      .join(graft.sources.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = q("q127_negative_sampling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPos, nNeg) = (r.getLong(1), r.getLong(2))
      assert(nNeg >= 1 && nNeg <= 3, s"cust ${r.getLong(0)}: n_neg=$nNeg")
      assert(nPos >= 0)
    }
    // the checksum pins WHICH parts were sampled — recompute the draw
    // chain for one customer and confirm none of its kept parts is a
    // positive (the anti-join contract, checked independently)
    val mp = graft.sources.Tables.part(spark, sf)
      .agg(max("p_partkey")).head().getLong(0)
    val cust = rows.head.getLong(0)
    val draws = (0 until 8).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$cust:$i".getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      i -> (java.lang.Long.parseLong(hex, 16) % mp + 1)
    }
    val kept = draws.groupBy(_._2).map { case (p, ds) => ds.map(_._1).min -> p }
      .toSeq.sortBy(_._1).map(_._2).filterNot(p => pos((cust, p))).take(3)
    assert(kept.sum === rows.head.getLong(3), "checksum must pin the draw chain")
  }

  test("q128 preference pairs: non-negative margins, disjoint chosen/rejected sets") {
    val rows = q("q128_preference_pairs").collect()
    assert(rows.nonEmpty)
    val chosen = rows.map(_.getLong(2)).toSet
    val rejected = rows.map(_.getLong(3)).toSet
    assert(chosen.intersect(rejected).isEmpty,
      "a document must never be both chosen and rejected")
    rows.foreach { r =>
      assert(r.getLong(6) >= 0, s"pair ${r.getString(0)}/${r.getInt(1)}: negative margin")
      assert(r.getLong(4) === r.getLong(5) + r.getLong(6))
    }
  }

  test("q86 common-token ratio bounded by 1 and monotone with n_common") {
    q("q86_common_token_ratio").collect().foreach { r =>
      val (n, common, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(common <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("q172 shard balance: snake over 16..1 token docs equalizes every shard at 17 tokens") {
    import spark.implicits._
    // docs with 16, 15, ..., 1 tokens: block one deals 16..9 to shards
    // 0..7, block two deals 8..1 BACK to shards 7..0 — every shard gets
    // exactly two docs totalling 17 tokens (the boustrophedon identity).
    val docs = (1 to 16).map { k =>
      (k.toLong, Seq.fill(17 - k)("t").mkString(" "), "en", "s0", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graftshard").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q172_shard_balance")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toList === (0L until 8L).map(sh => (sh, 2L, 17L)).toList)
  }

  test("q144 VAD segmentation: known byte pattern yields exact segment boundaries") {
    import spark.implicits._
    // 'z' (0x7a) frames score 16*122 = 1952 > gate; space frames score
    // 16*32 = 512 < gate — two active islands split by one silent gap
    val text = "z" * 32 + " " * 32 + "z" * 32
    val docs = Seq((1L, text, "en", "t", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graftvad").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val segs = SparkEntry.queries("q144_vad_segments")(spark, dir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(segs.toList === List((0, 1, 2L, 2 * 16L * 122), (4, 5, 2L, 2 * 16L * 122)))
  }

  test("q264 k-anonymity ladder: coarsening theorems hold — k never drops, classes never grow, suppression never rises") {
    val rows = q("q264_kanonymity").collect().sortBy(_.getInt(0))
    assert(rows.length === 3)
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    val nRows = rows.map(_.getAs[Long]("n_rows")).distinct
    assert(nRows.length === 1, "every level audits every customer")
    // a generalization LADDER, not three independent groupings: each level
    // is a coarsening, so these are theorems of the construction
    val k = rows.map(_.getAs[Long]("k_anonymity"))
    assert(k(0) <= k(1) && k(1) <= k(2), k.mkString(","))
    val nc = rows.map(_.getAs[Long]("n_classes"))
    assert(nc(0) >= nc(1) && nc(1) >= nc(2), nc.mkString(","))
    val sup = rows.map(_.getAs[Long]("suppressed_rows"))
    assert(sup(0) >= sup(1) && sup(1) >= sup(2), sup.mkString(","))
    rows.foreach { r =>
      val ppm = r.getAs[Long]("suppressed_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      val ld = r.getAs[Long]("l_diversity")
      assert(ld === -1L || ld >= 1L)
      assert(r.getAs[Long]("violating_classes") <= r.getAs[Long]("n_classes"))
    }
  }

  test("q273 token windows: 24/20 geometry tiles exactly, token mass conserved, planted doc chunks by hand") {
    val rows = q("q273_token_windows").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (chunk, n, ov, f, l) = (r.getAs[Long]("chunk"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_overlap"),
        r.getAs[Long]("first_tok"), r.getAs[Long]("last_tok"))
      assert(f === 20L * chunk, "chunks start on the stride grid")
      assert(n === l - f + 1, "windows are contiguous token ranges")
      assert(n <= 24L && ov <= 4L)
    }
    // conservation: each token is OWNED by exactly one chunk, so
    // Σ(n_tokens − n_overlap) per doc = the doc's token count
    val own = rows.groupBy(_.getLong(0)).view.mapValues(
      _.map(r => r.getAs[Long]("n_tokens") - r.getAs[Long]("n_overlap")).sum)
    val counts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
          .cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    own.foreach { case (doc, o) => assert(o === counts(doc), s"doc $doc") }
    // hand-checked 45-token doc: [0,24), [20,44), [40,45)
    import spark.implicits._
    val docs = Seq((7L, (1 to 45).map(i => s"w$i").mkString(" "), "en", "t", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graftchunk").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q273_token_windows")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("first_tok"),
        r.getAs[Long]("last_tok")))
    assert(got.toList === List(
      (0L, 24L, 4L, 0L, 23L), (1L, 24L, 4L, 20L, 43L),
      (2L, 5L, 0L, 40L, 44L)))
  }

  test("q278 passage retrieval: 4x3 ranked rows descending per term; planted corpus reproduces the hand-derived BM25 score") {
    val rows = q("q278_passage_retrieval").collect()
    assert(rows.length === 12)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
      val scores = sorted.map(_.getAs[Long]("score_ppm"))
      scores.sliding(2).foreach { w => assert(w(1) <= w(0)) }
      scores.foreach(sc => assert(sc > 0L))
    }
    // planted: 3 docs over a 2-term vocabulary with hand-derived passage
    // stats (n_p=7, sum_pl=136, df(a)=5; doc 1 chunk 0 has tf=24, pl=24)
    // — the expected score computed with the IDENTICAL double arithmetic,
    // so equality is exact. This pin exists because the first cut of this
    // query silently attached a per-union-leg pl (see the staging comment
    // in Pipeline.scala) — a value-level trap only a value pin catches.
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(50)("a").mkString(" "), "en", "t", 50L),
      (2L, Seq.fill(30)("b").mkString(" "), "en", "t", 30L),
      (3L, (0 until 40).map(i => if (i % 2 == 0) "a" else "b")
        .mkString(" "), "en", "t", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graftpr").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q278_passage_retrieval")(spark, dir)
      .collect().filter(r => r.getString(0) == "a" && r.getInt(1) == 1)
    assert(got.length === 1)
    assert(got(0).getAs[Long]("doc_id") === 1L)
    assert(got(0).getAs[Long]("chunk") === 0L)
    val (np, sumPl, df, tf, pl) = (7L, 136L, 5L, 24L, 24L)
    val expected = Math.round(
      Math.log((np - df + 0.5) / (df + 0.5) + 1.0) *
        (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (pl.toDouble * np / sumPl))))
        * 1000000)
    assert(got(0).getAs[Long]("score_ppm") === expected)
  }

  test("q271 audio fingerprint: every probe achieves perfect snippet recall; a planted clip is recognized at its true offset") {
    val rows = q("q271_audio_fingerprint").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the corpus contains every probe's own source, so the winner's
      // votes must equal the snippet's landmark count (self, or an exact
      // twin that ties and wins the min-id tiebreak)
      assert(r.getAs[Long]("votes") === r.getAs[Long]("n_query_landmarks"),
        s"probe ${r.getAs[Long]("probe_id")} lost snippet landmarks")
      assert(r.getAs[Long]("n_query_landmarks") >= 1L)
    }
    // planted recognition: doc 3 (a probe under the %11 rule) carries a
    // 128-byte 16-aligned clip of doc 1 as its middle third — the match
    // must be doc 1 (ties with self, min-id wins) at frame offset +4
    import spark.implicits._
    // aperiodic within any 512-byte window (quadratic mod 89, coprime to
    // the 16-byte frame size) — a linear-mod-64 sequence repeats every 4
    // frames and the clip would match at every offset ≡ 0 (mod 4)
    def s(n: Int, salt: Int) =
      (0 until n).map(i => ((i * i * 3 + i * 5 + salt) % 89 + 33).toChar)
        .mkString
    val src = s(512, 11)
    val clip = src.substring(192, 320)
    val probe = s(128, 23) + clip + s(128, 51)
    val docs = Seq((1L, src, "en", "t", 512L), (3L, probe, "en", "t", 384L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graftafp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q271_audio_fingerprint")(spark, dir)
      .collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("probe_id") === 3L)
    assert(got(0).getAs[Long]("best_match") === 1L,
      "the clip's source must win the tiebreak against self")
    assert(got(0).getAs[Long]("best_offset") === 4L,
      "clip starts at doc-3 frame 8 = doc-1 frame 12")
    assert(got(0).getAs[Long]("votes") ===
      got(0).getAs[Long]("n_query_landmarks"))
  }

  test("q256 pHash dedup: identical payloads are mutual mates with the least id canonical; a disjoint payload stands alone") {
    import spark.implicits._
    // docs 1 and 2 byte-identical → identical 56-bit hash (hamming 0);
    // doc 3 shares no slice → expected far apart (verified by the
    // assertion itself: if the stub ever hashed them close, this breaks)
    val docs = Seq(
      (1L, "aaaaaaaabbbbbbbbccccccccddddddddeeeeeeeeffffffffgggggggg", "en", "t", 56L),
      (2L, "aaaaaaaabbbbbbbbccccccccddddddddeeeeeeeeffffffffgggggggg", "en", "t", 56L),
      (3L, "zzzzzzzzyyyyyyyyxxxxxxxxwwwwwwwwvvvvvvvvuuuuuuuutttttttt", "en", "t", 56L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graftphash").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q256_phash_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toList === List(
      (1L, 1L, 2L, false),  // canonical copy: has a mate, keeps itself
      (2L, 1L, 1L, true),   // the duplicate: least mate 1 < 2
      (3L, 0L, -1L, false)),
      got.mkString(","))
  }

  test("q186 dataset card: every column recomputes by hand on a planted two-source corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b", "en", "A", 3),   // exact twin of doc 1
      (1L, "a b", "en", "A", 3),
      (2L, "c d e", "de", "A", 5),
      (3L, "z", "fr", "B", 1))
    val dir = java.nio.file.Files.createTempDirectory("graftcard").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q186_dataset_card")(spark, dir).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    // A: 3 docs, 7 tokens, vocab 5, 1 removable dup, mean chars
    // (3+3+5)·100 div 3 = 366; entropy −(2/3)ln(2/3) − (1/3)ln(1/3) =
    // 270310 + 366204 µnats (each term rounded separately)
    assert(got("A") === Seq(3L, 7L, 5L, 1L, 333333L, 366L, 636514L),
      got.toString)
    // B: single doc, single lang → entropy exactly 0
    assert(got("B") === Seq(1L, 1L, 1L, 0L, 0L, 100L, 0L), got.toString)
  }

  test("q207 epoch shuffle: ranks reproduce a driver-side md5 sort; epochs permute differently") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"t$i", "en", "s", 2))
    val dir = java.nio.file.Files.createTempDirectory("graftepoch").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (0 until 3).map { e =>
      val order = (1L to 20L).sortBy(id => (md5hex(s"$e:$id"), id))
      val checksum = order.zipWithIndex
        .map { case (id, i) => BigInt(i + 1) * id }.sum %
        BigInt("2305843009213693951")
      (e, 20L, checksum.toLong, order(0), order(1), order(2))
    }
    val got = SparkEntry.queries("q207_epoch_shuffle")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toList === expected.toList, got.mkString(","))
    // the permutations genuinely differ between epochs
    assert(expected.map(_._3).distinct.size === 3)
  }

  test("q259 consensus law: fused top-5 recall of dual-confirmed docs is never below either single leg's") {
    // The RRF inequality behind the law: a doc on BOTH depth-10 lists
    // scores >= 2*(1e6 div 70) = 28570 ppm, while a single-leg doc tops
    // out at 1e6 div 61 = 16393 — so fusion surfaces every dual-confirmed
    // doc before any single-leg doc. With ground truth = the
    // dual-confirmed set, fused recall@5 is the maximum achievable at the
    // cut, hence >= each leg's recall@5. This asserts the REAL legs and
    // the REAL fused output agree with the theorem (and that it is not
    // vacuous on the fixtures).
    val sparse = operators.Pipeline.hybridSparseLeg(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dense = operators.Similarity.ivfProbeTopK(spark, sf,
        operators.Pipeline.hybridSample(spark, sf),
        operators.Pipeline.hybridDepth).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val fusedTop5 = q("q259_hybrid_retrieval").collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val qids = sparse.map(_._1).toSet ++ dense.map(_._1).toSet
    var evaluated = 0
    for (qid <- qids) {
      val sTop = sparse.collect { case (q, dId, rk) if q == qid => dId -> rk }.toMap
      val dTop = dense.collect { case (q, dId, rk) if q == qid => dId -> rk }.toMap
      val dual = sTop.keySet intersect dTop.keySet
      if (dual.nonEmpty) {
        evaluated += 1
        def recall5(top: Map[Long, Int]) =
          top.collect { case (dId, rk) if rk <= 5 && dual(dId) => dId }.size.toDouble / dual.size
        val rf = fusedTop5.getOrElse(qid, Set.empty).count(dual).toDouble / dual.size
        assert(rf >= recall5(sTop) && rf >= recall5(dTop),
          s"q=$qid fused=$rf sparse=${recall5(sTop)} dense=${recall5(dTop)} dual=$dual")
      }
    }
    assert(evaluated > 0, "law vacuous: no query had dual-confirmed docs")
  }
}
