package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val planted = Seq(
    (0L, "alpha beta gamma alpha alpha", "en", "srcA"),
    (1L, "one two three four five six", "en", "srcA"),
    (2L, "solo", "en", "srcB"),
    (3L, "x y x y x y x y", "en", "srcB")
  ).toDF("doc_id", "text", "lang", "source")

  test("repetitionMetrics: top word/bigram shares and duplicate fraction") {
    val m = Curation.repetitionMetrics(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: 5 words, alpha ×3 → top_word alpha 0.6; distinct 3/5 → dup 0.4
    assert(m(0L).getString(3) === "alpha")
    assert(m(0L).getDouble(4) === 0.6)
    assert(m(0L).getDouble(2) === 0.4)
    // doc 1: all unique → dup 0, every word count 1 → lexicographic min
    assert(m(1L).getDouble(2) === 0.0)
    assert(m(1L).getString(3) === "five")
    // doc 2: single token → no bigrams → top_bigram_frac 0
    assert(m(2L).getDouble(5) === 0.0)
    // doc 3: "x y" bigram dominates: 4 of 7 bigrams
    assert(m(3L).getDouble(5) === math.round(4.0 / 7.0 * 1e6) / 1e6)
  }

  test("gopherFilters: per-rule flags compose into keep") {
    val rows = Curation.gopherFilters(planted, minWords = 5, maxWords = 10,
      minStopFrac = 0.0, maxDupFrac = 0.3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows(0L).getBoolean(8)) // dup 0.4 > 0.3 → rep_ok false
    assert(rows(1L).getBoolean(9))  // 6 unique words → keep
    assert(!rows(2L).getBoolean(5)) // 1 word < 5 → len_ok false
    assert(!rows(3L).getBoolean(9)) // dup 0.75 → dropped
  }

  test("piiRedact replaces emails, phones, and IPs; counts match") {
    val df = Seq(
      (0L, "contact me at jo.doe+x@mail.example.org or 555-123-4567"),
      (1L, "server 10.0.255.7 and 192.168.1.1 are up"),
      (2L, "clean text, nothing to redact")
    ).toDF("doc_id", "text")
    val out = df.select(
      Seq(col("doc_id"), Curation.piiRedact(col("text")).as("r")) ++
        Curation.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) === "contact me at <EMAIL> or <PHONE>")
    assert((out(0L).getLong(2), out(0L).getLong(3), out(0L).getLong(4)) === ((1L, 1L, 0L)))
    assert(out(1L).getString(1) === "server <IP> and <IP> are up")
    assert(out(1L).getLong(4) === 2L)
    assert(out(2L).getString(1) === "clean text, nothing to redact")
  }

  test("corpusShuffle is deterministic and a permutation") {
    val a = Curation.corpusShuffle(planted).collect().map(_.getLong(0)).toSeq
    val b = Curation.corpusShuffle(planted).collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.sorted === Seq(0L, 1L, 2L, 3L))
    // a different seed gives a different (but still deterministic) order
    val c = Curation.corpusShuffle(planted, seed = "s1").collect()
      .map(_.getLong(0)).toSeq
    assert(c.sorted === Seq(0L, 1L, 2L, 3L))
  }

  test("domainMix caps per source deterministically") {
    val out = Curation.domainMix(planted, caps = Map("srcA" -> 1), defaultCap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._2 == "srcA") === 1)
    assert(out.count(_._2 == "srcB") === 2)
    val again = Curation.domainMix(planted, caps = Map("srcA" -> 1), defaultCap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === again.toSeq)
  }

  test("temperatureMix: sqrt-weighted shares, exact integer allocation") {
    import spark.implicits._
    // srcA: 100 docs (w=10e6), srcB: 400 docs (w=20e6) → shares 1/3, 2/3
    val docs = (Seq.fill(100)("srcA") ++ Seq.fill(400)("srcB"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source")
    val out = Curation.temperatureMix(docs, budget = 900L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toList
    assert(out === List(
      ("srcA", 100L, 1.0 / 3.0, 300L),
      ("srcB", 400L, 2.0 / 3.0, 600L)))
    // allocation never exceeds the budget (floor division per source)
    assert(out.map(_._4).sum <= 900L)
  }

  test("domainPercentileFilter keeps the top fraction of EACH source") {
    import spark.implicits._
    // 5 docs per source; with unique ranks percent_rank = (r-1)/4, so
    // keep=0.5 retains ranks 1..3 of each source regardless of how the
    // sources' absolute quality ranges compare
    val docs = (0 until 10).map { i =>
      val src = if (i < 5) "srcA" else "srcB"
      // longer text → higher length/stopword score within each source
      val words = Seq.fill(3 + (i % 5) * 4)("the data row").mkString(" ")
      (i.toLong, words, "en", src)
    }.toDF("doc_id", "text", "lang", "source")
    val out = Curation.domainPercentileFilter(docs, keep = 0.5).collect()
    assert(out.count(_.getString(1) == "srcA") === 3)
    assert(out.count(_.getString(1) == "srcB") === 3)
    // survivors are exactly the per-source top-3 by (quality desc, doc_id)
    val scored = docs.select($"doc_id", $"source",
      round(graft.functions.TextFunctions.qualityScore($"text"), 6).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expect = scored.groupBy(_._2).flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(3).map(_._1).toSeq
    }.toSet
    assert(out.map(_.getLong(0)).toSet === expect)
  }

  test("importanceWeights ranks target-like docs above source-like docs (t46 semantics)") {
    import spark.implicits._
    // target vocab {alpha..}, source vocab {delta..}; doc 4 is a SOURCE
    // doc written in target vocabulary — the doc DSIR selection exists
    // to find — and doc 9 is all-novel vocabulary (smoothing floor).
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha gamma", true),
      (3L, "alpha alpha beta gamma beta", true),
      (4L, "alpha beta gamma beta alpha", false),
      (5L, "delta epsilon zeta delta", false),
      (6L, "epsilon zeta delta zeta", false),
      (7L, "zeta delta epsilon delta", false),
      (9L, "omicron sigma tau upsilon", false)
    ).toDF("doc_id", "text", "is_target")
    for (oracleHash <- Seq(false, true)) {
      val r = Curation.importanceWeights(docs, col("is_target"),
          buckets = 4096, oracleHash = oracleHash)
        .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
      // the target-vocab source doc outranks every source-vocab doc and
      // the novel-vocab doc; novel vocab sits at the smoothing floor
      // (tgt_f=0, all_f=1 per token → ratio 1/2), below target-vocab docs
      for (id <- Seq(5L, 6L, 7L, 9L))
        assert(r(4L) > r(id), s"oracleHash=$oracleHash: doc4=${r(4L)} !> doc$id=${r(id)}")
      assert(r(9L) === 0.5, s"smoothing floor drifted: ${r(9L)}")
      for (id <- Seq(5L, 6L, 7L))
        assert(r(id) < 0.5, s"source-vocab doc$id=${r(id)} not below the floor")
    }
  }

  test("importanceWeights broadcasts the bounded feature table (scale contract)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val df = Curation.importanceWeights(docs, col("lang") === "en", buckets = 64)
    val names = graft.tools.PlanInspect.nodeNames(df)
    assert(names.exists(_.contains("BroadcastHashJoin")),
      s"feature join did not broadcast: ${names.distinct.mkString(",")}")
  }

  test("curriculumOrder: bins partition quality monotonically, order deterministic") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = Curation.curriculumOrder(docs).collect()
    assert(out.length === docs.count())
    val bins = out.map(_.getLong(2))
    assert(bins.forall(b => b >= 1 && b <= 10))
    // monotone partition: the best quality of bin k never exceeds the
    // worst of bin k+1
    val byBin = out.groupBy(_.getLong(2)).map { case (b, rows) =>
      b -> (rows.map(_.getDouble(1)).min, rows.map(_.getDouble(1)).max)
    }
    byBin.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(byBin(lo)._2 <= byBin(hi)._1,
          s"bin $lo max ${byBin(lo)._2} > bin $hi min ${byBin(hi)._1}")
      case _ =>
    }
    // best-first: the emitted order starts at the highest bin
    assert(out.head.getLong(2) === bins.max)
    // reproducible by construction
    val again = Curation.curriculumOrder(docs).collect()
    assert(out.map(_.getLong(0)).toSeq === again.map(_.getLong(0)).toSeq)
  }

  test("tokenDrift: TVD is exactly 0 for identical slices, 1 for disjoint") {
    val same = Seq((0L, "x x y z"), (1L, "x x y z")).toDF("doc_id", "text")
    val tvd0 = Curation.tokenDrift(same, col("doc_id") === 0)
      .select(col("tvd")).head.getDouble(0)
    assert(tvd0 === 0.0) // equal distributions: every numerator term is 0
    val disjoint = Seq((0L, "aa aa"), (1L, "bb bb bb")).toDF("doc_id", "text")
    val out = Curation.tokenDrift(disjoint, col("doc_id") === 0).collect()
    assert(out.head.getDouble(5) === 1.0) // no shared mass → TVD exactly 1
    // the two occupied buckets carry equal exact numerators (|2·3−0| = |0−3·2|)
    assert(out.count(r => r.getDouble(4) === 1.0) === 2)
  }

  test("driftAgainstBaseline ≡ tokenDrift: the store path cannot drift") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val isA = col("lang") === "en"
    val dir = java.nio.file.Files.createTempDirectory("drift_base_spec")
    try {
      Curation.writeDriftBaseline(docs.filter(isA), dir.toString,
        oracleHash = true)
      val viaStore = Curation.driftAgainstBaseline(
        spark, docs.filter(!isA), dir.toString, oracleHash = true).collect()
      val recompute = Curation.tokenDrift(docs, isA, oracleHash = true)
        .collect()
      assert(viaStore.map(_.toSeq).toSeq === recompute.map(_.toSeq).toSeq)
      assert(viaStore.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("lengthBatchingEfficiency: hand-computed waste, zero-waste guard") {
    import spark.implicits._
    // lang a, batchSize 2, lengths 10,10,100,100 in arrival order
    // 10,100,10,100: arrival batches (10,100),(10,100) waste 90+90=180;
    // sorted batches (10,10),(100,100) waste 0 → saving 1.0.
    // lang b: all equal lengths → both orderings waste 0 → saving 0.0
    // (the div-by-zero guard).
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 100L), (3L, "a", 10L), (4L, "a", 100L),
      (5L, "b", 50L), (6L, "b", 50L), (7L, "b", 50L)
    ).toDF("doc_id", "lang", "n_chars")
    val out = Curation.lengthBatchingEfficiency(docs, batchSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      ("a", 4L, 2L, 0L, 180L, 1.0),
      ("b", 3L, 2L, 0L, 0L, 0.0)))
  }

  test("lineDedup drops cross-doc repeated lines, keeps order, handles all-dropped") {
    import spark.implicits._
    // "cookie banner" appears in docs 1 and 2 → dropped from both;
    // doc 3 is ENTIRELY the banner → everything dropped, md5("")
    val lines = Seq(
      (1L, 0L, "unique alpha"), (1L, 1L, "cookie banner"), (1L, 2L, "unique beta"),
      (2L, 0L, "cookie banner"), (2L, 1L, "other text"),
      (3L, 0L, "cookie banner")
    ).toDF("doc_id", "pos", "line")
    val out = Curation.lineDedup(lines).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq === Seq(
      (1L, 3L, 1L, h("unique alpha unique beta")), // order preserved
      (2L, 2L, 1L, h("other text")),
      (3L, 1L, 1L, h(""))))                        // fully-boilerplate doc
    // within-doc repetition alone is NOT boilerplate (df counts docs)
    val solo = Seq((9L, 0L, "same line"), (9L, 1L, "same line"))
      .toDF("doc_id", "pos", "line")
    val kept = Curation.lineDedup(solo).head()
    assert(kept.getLong(2) === 0L, kept) // nothing dropped
  }

  test("filterAgreement: confusion counts and exact metrics") {
    // TP×3, FP×1, FN×2, TN×4 → n=10
    val verdicts = Seq(
      (true, true), (true, true), (true, true), (true, false),
      (false, true), (false, true),
      (false, false), (false, false), (false, false), (false, false)
    ).toDF("p", "g")
    val r = Curation.filterAgreement(verdicts, col("p"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((3L, 1L, 2L, 4L, 10L)))
    assert(r.getDouble(5) === 0.7)         // acc
    assert(r.getDouble(6) === 0.75)        // prec = 3/4
    assert(r.getDouble(7) === 0.6)         // rec = 3/5
    assert(r.getDouble(8) === 6.0 / 9.0)   // f1 = 2·3/(2·3+1+2), ONE division
    // pe = (4/10)(5/10) + (6/10)(5/10) = 0.5 → kappa = (0.7-0.5)/0.5
    assert(math.abs(r.getDouble(9) - 0.4) < 1e-15)
  }

  test("filterAgreement: degenerate denominators yield NULL, not NaN") {
    // the predictor never fires → tp+fp = 0 → precision undefined
    val verdicts = Seq((false, true), (false, false)).toDF("p", "g")
    val r = Curation.filterAgreement(verdicts, col("p"), col("g")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((0L, 0L, 1L, 1L)))
    assert(r.isNullAt(6), "precision must be NULL when tp+fp = 0")
    assert(r.getDouble(8) === 0.0) // f1 = 0/(0+1) — defined, zero
    // pe = 0·0.5 + 1·0.5 = 0.5 → kappa = (0.5-0.5)/0.5 = 0 (no skill)
    assert(r.getDouble(9) === 0.0)
  }

  test("tokenDistributionOutliers: exact scaled TVD with closed-form absent mass") {
    // global: a=5, b=4, N=9 — the tCloseness spec corpus as documents.
    // doc1 (a a a b): partial = (|27-20|-20) + (|9-16|-16) = -22,
    //   scaled = -22 + 4*9 = 14; doc2 mirrors at 22; doc3 (a): the
    //   absent 'b' contributes ONLY through the +n*N closure: 8.
    val docs = Seq((1L, "a a a b"), (2L, "a b b b"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = Curation.tokenDistributionOutliers(docs, tNum = 2L, tDen = 5L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 4L, 14L, 14.0 / 72.0, false),
      (2L, 4L, 22L, 22.0 / 72.0, false),
      (3L, 1L, 8L, 8.0 / 18.0, true)))
  }

  test("ksStatistic: hand-computed integer rational max") {
    import spark.implicits._
    // A = {1,2,3}, B = {3,4,5}: numerators |fa*nb - fb*na| over the
    // merged support are 3,6,6,3,0 -> D = 6/9 = 2/3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 3L), ("b", 4L), ("b", 5L)).toDF("g", "x")
    val r = Curation.ksStatistic(df, col("g"), col("x"), "a", "b").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 6.0)
    assert(r.getDouble(3) === 6.0 / 9.0)
  }

  test("ksStatistic: identical samples have D = 0") {
    import spark.implicits._
    val vals = Seq(5L, 9L, 9L, 14L)
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("g", "x")
    val r = Curation.ksStatistic(df, col("g"), col("x"), "a", "b").head()
    assert(r.getDouble(3) === 0.0)
  }

  test("chiSquareHomogeneity: homogeneous table -> 0; diagonal 2x2 -> N") {
    import spark.implicits._
    // perfectly homogeneous 2x2 (same column mix in both rows)
    val hom = (Seq.fill(6)(("r1", "c1")) ++ Seq.fill(3)(("r1", "c2")) ++
      Seq.fill(4)(("r2", "c1")) ++ Seq.fill(2)(("r2", "c2")))
      .toDF("rk", "ck")
    val h = Curation.chiSquareHomogeneity(hom, col("rk"), col("ck")).head()
    assert(h.getDouble(4) === 0.0, h)
    // complete dependence: O = [[10,0],[0,10]] -> chi2 = N = 20, dof 1
    val dep = (Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r2", "c2")))
      .toDF("rk", "ck")
    val d = Curation.chiSquareHomogeneity(dep, col("rk"), col("ck")).head()
    assert(d.getLong(0) === 20L && d.getLong(3) === 1L)
    assert(d.getDouble(4) === 20.0, d)
  }

  test("mannWhitney: hand-computed U with ties; dominance extremes") {
    import spark.implicits._
    // A = {1,2}, B = {2,3}: pairs with a>b: 0, ties: one -> U_a = 0.5,
    // u2 = 1, auc = 0.5/4 = 0.125
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)).toDF("g", "x")
    val r = Curation.mannWhitney(df, col("g"), col("x"), "a", "b").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 0.125)
    // complete dominance: every a below every b -> auc 0; reversed -> 1
    val lo = Seq(("a", 1L), ("a", 2L), ("b", 5L), ("b", 9L)).toDF("g", "x")
    assert(Curation.mannWhitney(lo, col("g"), col("x"), "a", "b")
      .head().getDouble(3) === 0.0)
    assert(Curation.mannWhitney(lo, col("g"), col("x"), "b", "a")
      .head().getDouble(3) === 1.0)
  }

  test("mannWhitney: identical samples give auc exactly 0.5") {
    import spark.implicits._
    val vals = Seq(3L, 3L, 7L, 11L)
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("g", "x")
    val r = Curation.mannWhitney(df, col("g"), col("x"), "a", "b").head()
    assert(r.getDouble(3) === 0.5)
  }

  test("quantileNormalize: identity on identical distributions; hand-computed shift") {
    import spark.implicits._
    val vals = Seq(1L, 3L, 3L, 9L)
    val same = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("g", "x")
    val id = Curation.quantileNormalize(same, col("g"), col("x"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(id.forall { case (x, m) => x == m }, id.toSeq)
    // b = a + 10 elementwise: every b-value maps back to its a twin
    val shifted = (vals.map(("a", _)) ++ vals.map(v => ("b", v + 10L)))
      .toDF("g", "x")
    val m = Curation.quantileNormalize(shifted, col("g"), col("x"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(m === Map(11L -> 1L, 13L -> 3L, 19L -> 9L), m)
  }

  test("quantileNormalize: unequal sizes use cross-multiplied ranks (no division)") {
    import spark.implicits._
    // a = {10, 20} (n=2), b = {1, 2, 3, 4} (n=4): fb*na/nb thresholds
    // 0.5,1,1.5,2 -> b-values 1,2 map to 10 (fa=1 >= fb*2/4), 3,4 -> 20
    val df = (Seq(10L, 20L).map(("a", _)) ++ Seq(1L, 2L, 3L, 4L).map(("b", _)))
      .toDF("g", "x")
    val m = Curation.quantileNormalize(df, col("g"), col("x"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(m === Map(1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L), m)
  }

  test("welchT: hand-computed statistic from exact moments") {
    import spark.implicits._
    // a = {1,2,3}: mean 2, var 1; b = {2,4,6,8}: mean 5, var 20/3
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(2L, 4L, 6L, 8L).map(("b", _))).toDF("g", "x")
    val r = Curation.welchT(df, col("g"), col("x"), "a", "b").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 5.0)
    // replay the documented double DAG exactly
    val va = (14.0 - 6.0 * 6.0 / 3.0) / 2.0
    val vb = (120.0 - 20.0 * 20.0 / 4.0) / 3.0
    val se2a = va / 3.0; val se2b = vb / 4.0
    assert(r.getDouble(4) === (2.0 - 5.0) / math.sqrt(se2a + se2b))
    assert(r.getDouble(5) ===
      (se2a + se2b) * (se2a + se2b) /
        (se2a * se2a / 2.0 + se2b * se2b / 3.0))
  }

  test("cramersV: perfect association is 1, independence is 0") {
    import spark.implicits._
    val perfect = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("r", "c")
    val p = Curation.cramersV(perfect, col("r"), col("c")).head()
    assert(p.getDouble(4) === 1.0, p)
    val indep = (for (r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 3)
      yield (r, c)).toDF("r", "c")
    val i = Curation.cramersV(indep, col("r"), col("c")).head()
    assert(i.getDouble(3) === 0.0 && i.getDouble(4) === 0.0, i)
  }

  test("calibrationReport: hand-computed bins; score 1.0 clamps into the top bin") {
    import spark.implicits._
    val df = Seq((0.05, true), (0.05, false), (0.32, false),
      (0.95, true), (1.0, true)).toDF("score", "y")
    val out = Curation.calibrationReport(df, col("score"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (0L, 2L, 1L, 0.5, 0.05, 0.45),
      (3L, 1L, 0L, 0.0, 0.35, 0.35),
      (9L, 2L, 2L, 1.0, 0.95, 1.0 - 0.95)))
  }

  test("spearman: matches the brute-force mid-rank Pearson, ties included") {
    import spark.implicits._
    // hand data with ties in both margins
    val xs = Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L)
    val ys = Seq(1L, 2L, 2L, 2L, 1L, 3L, 3L)
    val df = xs.zip(ys).toDF("x", "y")
    // brute-force doubled mid-ranks in Scala
    def dranks(v: Seq[Long]): Seq[Long] = {
      val sorted = v.sorted
      v.map { a =>
        val before = sorted.count(_ < a)
        val cnt = sorted.count(_ == a)
        2L * before + cnt + 1L
      }
    }
    val rx = dranks(xs); val ry = dranks(ys)
    val n = xs.size.toDouble
    val sx = rx.sum.toDouble; val sy = ry.sum.toDouble
    val sxx = rx.map(r => r * r).sum.toDouble
    val syy = ry.map(r => r * r).sum.toDouble
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum.toDouble
    // the same double DAG as the operator, op for op
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val r = Curation.spearman(df, col("x"), col("y")).head()
    assert(r.getLong(0) === xs.size.toLong)
    assert(r.getDouble(1) === want)
    // perfect monotone, no ties: rho is exactly the DAG value of equal
    // rank vectors (and numerically 1 within one ulp)
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("x", "y")
    val rho1 = Curation.spearman(mono, col("x"), col("y")).head().getDouble(1)
    assert(math.abs(rho1 - 1.0) < 1e-12)
    // reversal flips the sign exactly
    val anti = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L)).toDF("x", "y")
    val rhoM = Curation.spearman(anti, col("x"), col("y")).head().getDouble(1)
    assert(rhoM === -rho1)
  }

  test("kendallTau: concordant/discordant counts match all-pairs brute force") {
    import spark.implicits._
    val xs = Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 5L)
    val ys = Seq(2L, 1L, 2L, 3L, 1L, 3L, 4L, 4L)
    val pts = xs.zip(ys)
    val df = pts.toDF("x", "y")
    // brute force over element pairs
    val pairs = for {
      i <- pts.indices; j <- pts.indices if i < j
    } yield (pts(i), pts(j))
    val conc = pairs.count { case ((x1, y1), (x2, y2)) =>
      (x1 - x2) * (y1 - y2) > 0 }
    val disc = pairs.count { case ((x1, y1), (x2, y2)) =>
      (x1 - x2) * (y1 - y2) < 0 }
    val nn = pts.size.toLong
    val t0 = nn * (nn - 1)
    val t1 = xs.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
    val t2 = ys.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
    val want = 2.0 * (conc - disc).toDouble /
      math.sqrt((t0 - t1).toDouble * (t0 - t2).toDouble)
    val r = Curation.kendallTau(df, col("x"), col("y")).head()
    assert(r.getLong(0) === nn)
    assert(r.getDouble(1) === conc.toDouble)
    assert(r.getDouble(2) === disc.toDouble)
    assert(r.getDouble(3) === want)
    // all-tied x (single support value): denominator is 0 -> tau NaN,
    // conc = disc = 0 (no pair has x1 < x2)
    val flat = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    val f = Curation.kendallTau(flat, col("x"), col("y")).head()
    assert(f.getDouble(1) === 0.0 && f.getDouble(2) === 0.0)
    assert(f.getDouble(3).isNaN, "all-tied margin has no defined tau")
    val sFlat = Curation.spearman(flat, col("x"), col("y")).head()
    assert(sFlat.getDouble(1).isNaN, "constant margin has no defined rho")
  }

  test("kendallTau vs mannWhitney: the binary-X identity conc−disc = na·nb − u2 holds exactly") {
    // for X = group indicator (0/1) and Y = value: cross-group pairs
    // split into W (b wins) + L (a wins) + T (ties); Kendall counts
    // conc−disc = W−L and Mann–Whitney's doubled statistic is
    // u2_a = 2L+T, so conc−disc = na·nb − u2_a — an exact integer
    // theorem tying the two operators' independent decompositions
    // together on real data
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("source").isin("src0", "src1"))
    val k = Curation.kendallTau(docs,
      when(col("source") === "src0", 0L).otherwise(1L), col("n_chars"))
      .head()
    val m = Curation.mannWhitney(docs,
      col("source"), col("n_chars"), "src0", "src1").head()
    val na = m.getLong(0).toDouble
    val nb = m.getLong(1).toDouble
    val u2a = m.getDouble(2)
    assert(k.getDouble(1) - k.getDouble(2) === na * nb - u2a,
      s"conc=${k.getDouble(1)} disc=${k.getDouble(2)} na=$na nb=$nb u2=$u2a")
  }

  test("shuffleAudit: single-key corpus has ratio exactly 1; expectation is exact") {
    import spark.implicits._
    // all one key: every adjacent pair matches, same_adj = n-1, and
    // E[same] = n(n-1)/n = n-1 -> ratio exactly 1.0
    val one = (0L until 20L).map((_, "k")).toDF("id", "k")
    val r = Curation.shuffleAudit(one, col("id"), col("k")).head()
    assert(r.getLong(0) === 20L && r.getLong(1) === 19L && r.getLong(2) === 19L)
    assert(r.getDouble(3) === 19.0 && r.getDouble(4) === 1.0)
    // mixed keys: replay the avalanche-mix order in Scala and count
    // adjacent same-key pairs independently
    import graft.expressions.RollingHash.evalString
    def mix(i: Long): Long =
      evalString(evalString(i.toString).toString.reverse)
    val keys = (0L until 30L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    val df = keys.toDF("id", "k")
    val byOrder = keys.sortBy { case (i, _) => mix(i) }
    val expectSame = byOrder.sliding(2).count(w => w(0)._2 == w(1)._2)
    val m = Curation.shuffleAudit(df, col("id"), col("k")).head()
    assert(m.getLong(2) === expectSame.toLong, m)
    // exact expectation: sum c(c-1)/n with c = {10, 20}, n = 30
    assert(m.getDouble(3) === (10.0 * 9 + 20.0 * 19) / 30.0)
  }

  // ---- tokenizer fertility (t81's arithmetic, spec'd directly) ----

  test("token fertility: subword segmentation counts per language, hand-computed") {
    import graft.functions.TextFunctions.{bpeishTokenCount, tokenCount}
    // "hello, world! 123abc" → 3 whitespace words; bpe-ish splits to
    // hello , world ! 123 abc = 6 → fertility 2.0; the plain doc stays 1.0
    val docs = Seq(
      (0L, "hello, world! 123abc", "xx"),
      (1L, "plain words only here", "yy")
    ).toDF("doc_id", "text", "lang")
    val out = docs.groupBy(col("lang")).agg(
        sum(tokenCount(col("text")).cast("long")).as("w"),
        sum(bpeishTokenCount(col("text")).cast("long")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("xx") === ((3L, 6L)))
    assert(out("yy") === ((4L, 4L)))
  }

  // ---- filter funnel (t80) ----

  test("filterFunnel: one victim per stage, hand-computed attrition") {
    val good = "the " + (1 to 25).map(i => f"word$i%02d").mkString(" ")
    val docs = Seq(
      (0L, good, "en"),                                    // survives all
      (1L, good, "en"),                                    // exact dup of 0
      (2L, good, "fr"),                                    // language gate
      (3L, "the word01 word02", "en"),                     // length gate
      (4L, (1 to 26).map(i => f"word$i%02d").mkString(" "), "en"), // no stopword
      (5L, "the " + ("word01 " * 24).trim + " word02", "en") // repetition
    ).toDF("doc_id", "text", "lang")
    val out = Curation.filterFunnel(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, "raw", 6L, 0L), (1L, "language", 5L, 1L),
      (2L, "length", 4L, 1L), (3L, "mean_word_len", 4L, 0L),
      (4L, "stopword", 3L, 1L), (5L, "repetition", 2L, 1L),
      (6L, "exact_dedup", 1L, 1L)))
    val rates = Curation.filterFunnel(docs).collect()
      .map(r => (r.getDouble(4), r.getDouble(5)))
    assert(rates(1)._1 === 1.0 / 6 && rates(6)._1 === 0.5)
    assert(rates(6)._2 === 1.0 / 6)
  }

  // ---- Adjusted Rand Index (q214) ----

  test("adjustedRandIndex: hand-computed, identity = 1, singleton guard") {
    def part(assign: Seq[(Long, Long)]) = assign.toDF("doc_id", "cluster_id")
    val a = part(Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 6L -> 3L))
    val b = part(Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L))
    val r = Curation.adjustedRandIndex(a, b).collect()(0)
    assert(r.getLong(0) === 6L)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) === ((6.0, 12.0, 4.0)))
    val e = 6.0 * 12.0 / (6.0 * 5)
    assert(r.getDouble(4) === (4.0 - e) / ((6.0 + 12.0) / 2.0 - e))
    // identical partitions score exactly 1
    val same = Curation.adjustedRandIndex(a, a).collect()(0)
    assert(same.getDouble(4) === 1.0)
    // two all-singleton partitions are identical: the degenerate
    // denominator pins to 1 instead of throwing (ANSI rule 21a)
    val singles = part((1L to 6L).map(i => i -> (i + 10L)))
    val deg = Curation.adjustedRandIndex(singles, singles).collect()(0)
    assert(deg.getDouble(4) === 1.0)
  }

  // ---- self-BLEU-style corpus overlap precision (t77) ----

  test("selfOverlapPrecision: hand-computed clipped counts, both gram keys") {
    val tiny = Seq(
      (0L, "a b a b c"), (1L, "a b c d"), (2L, "x y z"), (3L, "q")
    ).toDF("doc_id", "text")
    for (hashGrams <- Seq(false, true)) {
      val out = Curation.selfOverlapPrecision(tiny, hashGrams = hashGrams)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
      // bigrams: doc0 {a b:2, b a:1, b c:1}; corpus a b:3, b c:2 →
      // clipped min(2,1)+min(1,0)+min(1,1) = 2 of 4
      assert(out(0L) === ((2L, 4L, 1L, 3L)), s"hashGrams=$hashGrams")
      assert(out(1L) === ((2L, 3L, 1L, 2L)), s"hashGrams=$hashGrams")
      assert(out(2L) === ((0L, 2L, 0L, 1L)), s"hashGrams=$hashGrams")
      // 1-token doc: the truncated window is its only (novel) gram
      assert(out(3L) === ((0L, 1L, 0L, 1L)), s"hashGrams=$hashGrams")
    }
  }

  test("selfOverlapPrecision: hashed grams reproduce the exact-string run") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val a = Curation.selfOverlapPrecision(docs, hashGrams = false)
    val b = Curation.selfOverlapPrecision(docs, hashGrams = true)
    assert(a.exceptAll(b).count() === 0L)
    assert(b.exceptAll(a).count() === 0L)
  }

  test("blocklistScreen counts whole words once per occurrence and flags by density") {
    val df = Seq(
      (1L, "slow merge slow hash fast"),     // 4 hits / 5 tokens -> flagged
      (2L, "slowly merged hashing sparky"),  // substrings must NOT match
      (3L, "scan filter row column batch")   // 0 hits
    ).toDF("doc_id", "text")
    val out = Curation.blocklistScreen(df,
        Seq("slow", "merge", "spark", "hash"), perMille = 200)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((4L, 5L, true)))
    assert(out(2L) === ((0L, 4L, false)), "\\b anchors failed on substrings")
    assert(out(3L) === ((0L, 5L, false)))
    // non-word-character terms are rejected loudly (the cross-dialect
    // \\b contract only holds for \\w-only terms)
    intercept[IllegalArgumentException] {
      Curation.blocklistScreen(df, Seq("a.b"))
    }
  }

  test("typeCoverage: exact head mass, per-mille floor, dense ks") {
    val df = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Curation.typeCoverage(df, ks = Seq(1, 4)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // counts: a=3, b=2, c=1; total 6, 3 types
    assert(out(1L) === ((3L, 1L, 3L, 6L, 500L, 0.5)))
    assert(out(4L) === ((3L, 3L, 6L, 6L, 1000L, 1.0)))
  }

  test("piiScan counts each class and redacts in declaration order") {
    val df = Seq(
      (1L, "mail a@b.co and b.user+x@sub.example.org end"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "ssn 123-45-6789 ip 10.0.255.1"),
      (4L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = Curation.piiScan(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // (n_email, n_phone, n_ssn, n_ipv4, n_pii, has_pii)
    def tup(id: Long) = (out(id).getLong(1), out(id).getLong(2),
      out(id).getLong(3), out(id).getLong(4), out(id).getLong(5),
      out(id).getBoolean(6))
    assert(tup(1L) === ((2L, 0L, 0L, 0L, 2L, true)))
    assert(tup(2L) === ((0L, 2L, 0L, 0L, 2L, true)))
    // an SSN also matches the phone shape (ddd-dd-dddd vs ddd-ddd-dddd:
    // it does NOT — phone needs 3-3-4; counts stay disjoint here)
    assert(tup(3L) === ((0L, 0L, 1L, 1L, 2L, true)))
    assert(tup(4L) === ((0L, 0L, 0L, 0L, 0L, false)))
    assert(out(1L).getString(7) === "mail [EMAIL] and [EMAIL] end")
    assert(out(2L).getString(7) === "call [PHONE] or [PHONE]")
    assert(out(3L).getString(7) === "ssn [SSN] ip [IPV4]")
    assert(out(4L).getString(7) === "clean text with no identifiers at all")
  }

  test("ipv4 pattern accepts only real octets (r12 directive #7)") {
    val df = Seq(
      (1L, "edge 255.255.255.255 and 0.0.0.0 and 192.168.1.254 ok"),
      (2L, "not ips: 999.999.999.999 or 256.1.1.1 or 1.2.3.456"),
      (3L, "embedded 1234.1.2.3 and trailing 1.2.3.4567")
    ).toDF("doc_id", "text")
    val out = Curation.piiScan(df).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap // n_ipv4
    assert(out(1L) === 3L)
    assert(out(2L) === 0L)
    assert(out(3L) === 0L)
  }
}
