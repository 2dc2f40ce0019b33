package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.load(spark, sf0001, "documents")

  test("stratified sample is deterministic and respects per-stratum rates") {
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 50), defaultPct = 10)
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 50), defaultPct = 10)
    val ids1 = s1.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === s2.select($"doc_id").collect().map(_.getLong(0)).toSet)
    val total = docs.filter($"lang" === "en").count().toDouble
    val kept = s1.filter($"lang" === "en").count().toDouble
    assert(kept / total > 0.3 && kept / total < 0.7) // ~50% of en
  }

  test("hash split is a partition: every row gets exactly one stable label") {
    val split = Sampling.hashSplit(docs, "doc_id")
    assert(split.count() === docs.count())
    val counts = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > counts("val")) // 80 vs 10 pct
    // corpus-growth stability is BY CONSTRUCTION: the label is a pure
    // function of doc_id alone (no count()/rank() in the expression), so
    // no cross-frame assertion can fail — what we pin instead is that the
    // bucket expression really is id-only: a one-row frame labels the
    // same way the full corpus does for that id
    val one = Sampling.hashSplit(docs.filter($"doc_id" === 42L), "doc_id")
      .select($"split").head.getString(0)
    val full = split.filter($"doc_id" === 42L).select($"split").head.getString(0)
    assert(one === full)
  }

  test("weightedBernoulli: deterministic, weight-proportional, saturating") {
    def kept(weight: org.apache.spark.sql.Column, rate: Double,
        oracle: Boolean = false): Set[Long] =
      Sampling.weightedBernoulli(docs, $"doc_id", weight, rate, "spec",
        oracleHash = oracle)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
    // zero weight keeps nothing; weight >= 1/rate saturates to everything
    assert(kept(lit(0.0), 0.5).isEmpty)
    assert(kept(lit(2.0), 0.5).size === docs.count())
    // deterministic across runs, and the production/oracle hashes both
    // land near the expected rate (500 docs, p=0.5 -> +-10% easily)
    val n = docs.count().toDouble
    for (oracle <- Seq(false, true)) {
      val k1 = kept(lit(1.0), 0.5, oracle)
      assert(k1 === kept(lit(1.0), 0.5, oracle))
      assert(k1.size / n > 0.4 && k1.size / n < 0.6)
      // halving the weight halves the kept set, and it nests: the same
      // row hash decides both cuts, so p=0.25 keeps a subset of p=0.5
      val k2 = kept(lit(0.5), 0.5, oracle)
      assert(k2.subsetOf(k1))
      assert(k2.size / n > 0.15 && k2.size / n < 0.35)
    }
  }

  test("packBins never overflows capacity by more than one document") {
    val withTok = docs.select($"doc_id", $"lang",
      graft.functions.TextFunctions.tokenCount($"text")
        .cast("bigint").as("n_tokens"))
    val packed = Sampling.packBins(withTok, "doc_id", "lang", "n_tokens", 512)
    val binTotals = packed.groupBy($"lang", $"bin")
      .agg(sum($"n_tokens").as("toks"), max($"n_tokens").as("biggest"))
      .collect()
    binTotals.foreach { r =>
      // a bin holds < capacity before its last doc was added
      assert(r.getLong(2) < 512 + r.getLong(3),
        s"bin ${r.get(0)}/${r.get(1)} total ${r.getLong(2)}")
    }
    assert(binTotals.length > 1) // corpus actually spans multiple bins
  }

  test("systematicSample matches the sequential reference fold exactly") {
    import spark.implicits._
    // skewed weights incl. one heavier than any plausible stride
    val rows = (0L until 200L).map(i => (i, 1L + (i % 7) * 3L + (if (i == 57L) 400L else 0L)))
    val df = rows.toDF("doc_id", "n_chars")
    val target = 20L
    val tot = rows.map(_._2).sum
    val stride = 1 + tot / target
    // sequential reference: cum in id order, pick if a multiple of the
    // stride falls inside (cum-w, cum]
    var cum = 0L
    val expected = rows.flatMap { case (id, w) =>
      val before = cum; cum += w
      if (cum / stride > before / stride) Some((id, w, cum)) else None
    }
    val got = Sampling.systematicSample(df, "doc_id", "n_chars", target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.exists(_._1 == 57L), "the heavy doc straddles a stride — must be picked")
    assert(got.size <= target && got.size >= target / 2, got.size)
  }

  test("systematicSample is bucket-count invariant (distributed ≡ sequential prefix sum)") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, 1L + i % 13)).toDF("doc_id", "n_chars")
    def run(b: Int) = Sampling.systematicSample(df, "doc_id", "n_chars", 40L, buckets = b)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(run(1) === run(64))
    assert(run(7) === run(64))
  }

  test("stratifiedSplit: exact per-stratum quotas, a partition, deterministic") {
    val out = Sampling.stratifiedSplit(docs, "doc_id", "source")
      .localCheckpoint()
    // exact quotas per stratum: floor(n*0.8) train, floor(n*0.9)-floor(n*0.8)
    // val, the rest test -- EXACT, not in-expectation
    val counts = out.groupBy($"stratum", $"split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sizes = docs.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (st, n) =>
      assert(counts.getOrElse((st, "train"), 0L) === n * 80 / 100, st)
      assert(counts.getOrElse((st, "val"), 0L) === n * 90 / 100 - n * 80 / 100, st)
      assert(counts.getOrElse((st, "test"), 0L) === n - n * 90 / 100, st)
    }
    // a partition of the corpus
    assert(out.count() === docs.count())
    assert(out.select($"doc_id").distinct().count() === docs.count())
    // deterministic run-to-run
    val again = Sampling.stratifiedSplit(docs, "doc_id", "source")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("hamiltonAlloc conserves the budget exactly and floors correctly") {
    // 3 sources with counts 100/400/900 -> sqrt weights 10e6/20e6/30e6
    // (exact integers after the floor-scale), shares 1/6, 2/6, 3/6 of
    // budget 100 -> base 16/33/50 (floor), leftover 1 goes to the
    // largest remainder: 100·10/60 = 16 rem 40, 100·20/60 = 33 rem 20,
    // 100·30/60 = 50 rem 0 -> source "a" gets the extra seat.
    val df = (Seq.fill(100)("a") ++ Seq.fill(400)("b") ++ Seq.fill(900)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source")
    val out = Sampling.hamiltonAlloc(df, "source", budget = 100L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("a") === ((16L, 1L, 17L)))
    assert(out("b") === ((33L, 0L, 33L)))
    assert(out("c") === ((50L, 0L, 50L)))
    assert(out.values.map(_._3).sum === 100L, "budget not conserved")
  }

  test("curriculumInterleave: injective positions, round-robin, easy-first") {
    // two equal sources -> positions are DENSE 0..n-1 and alternate
    val df = (0L until 20L).map(i =>
      (i, if (i % 2 == 0) "x" else "y", 100L - i)).toDF("doc_id", "src", "diff")
    val out = Sampling.curriculumInterleave(df, "src", col("diff"))
      .collect()
    val pos = out.map(_.getLong(4))
    assert(pos.toSet === (0L until 20L).toSet, "positions not dense/injective")
    // within a source, difficulty ascends with rank
    val bySrc = out.groupBy(_.getString(1))
    bySrc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(sorted.toSeq === sorted.sorted.toSeq, "not easiest-first")
    }
    // round-robin: consecutive global positions come from different sources
    val bySrcAt = out.map(r => r.getLong(4) -> r.getString(1)).toMap
    (0L until 19L).foreach(p =>
      assert(bySrcAt(p) != bySrcAt(p + 1), s"positions $p,${p + 1} same source"))
  }

  test("htTokenEstimate: exact HT identities in both hash modes") {
    // a certain row (w >= 2^(52-42) = 1024 tokens) + small docs
    val big = Seq.fill(1500)("x").mkString(" ")
    val df = ((1L to 40L).map(i => (i, "web", s"doc $i words " + ("t " * (i.toInt % 7 + 1)).trim))
      :+ (99L, "books", big)).toDF("doc_id", "source", "text")
    for (oracleMode <- Seq(true, false)) {
      val out = Sampling.htTokenEstimate(df, oracleHash = oracleMode)
        .collect().map(r => r.getString(0) -> r).toMap
      // the certain row is ALWAYS kept and contributes its exact w
      val books = out("books")
      assert(books.getLong(2) === 1L, s"certain row dropped ($oracleMode)")
      assert(books.getLong(4) === 1500L, "certain row must contribute w")
      assert(books.getLong(3) === 1500L)
      assert(books.getLong(5) === 0L, "certain-only source must have 0 error")
      // HT identity for the sampled source: ht = certainMass + 1024 * kept
      val web = out("web")
      val kept = web.getLong(2)
      assert(web.getLong(4) === kept * 1024L,
        s"HT estimate must be 1024/kept-row for non-certain rows ($oracleMode)")
      // err_permille is the truncating integer identity
      val expectedErr = (web.getLong(4) - web.getLong(3)) * 1000L / web.getLong(3)
      assert(web.getLong(5) === expectedErr)
    }
  }

  test("htTokenEstimate: a book-length (>2^21-token) document must not throw") {
    // Before the least(w, certainAt) clamp, the kept predicate computed
    // w * 2^42 in int64 and ANSI mode threw SparkArithmeticException for
    // any w >= 2^21 (~2.1M tokens) — the MomentTermSpec overflow class.
    // Plant one such document and assert the exact certain-row identity
    // still holds (the clamp must not change any decision).
    val wBig = (1 << 21) + 137 // 2,097,289 tokens
    val book = "t " * wBig
    val df = Seq(
      (1L, "books", book.trim),
      (2L, "web", "a small doc here"),
      (3L, "web", "another tiny document")).toDF("doc_id", "source", "text")
    for (oracleMode <- Seq(true, false)) {
      val out = Sampling.htTokenEstimate(df, oracleHash = oracleMode)
        .collect().map(r => r.getString(0) -> r).toMap
      val books = out("books")
      assert(books.getLong(2) === 1L, s"book row must be certain ($oracleMode)")
      assert(books.getLong(3) === wBig.toLong)
      assert(books.getLong(4) === wBig.toLong,
        s"certain row must contribute exact w ($oracleMode)")
      assert(books.getLong(5) === 0L)
    }
  }

  test("poissonBootstrapCI: ordered CI around the point mean, both hash modes") {
    for (oracleMode <- Seq(true, false)) {
      val out = Sampling.poissonBootstrapCI(docs, oracleHash = oracleMode)
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (src, n, point, lo, hi) = (r.getString(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4))
        assert(n > 0, src)
        assert(lo <= hi, s"$src: CI inverted ($oracleMode)")
        // with ~100 docs per source the 2.5/97.5 bootstrap CI straddles
        // the sample mean (deterministic given the seeded draws, so
        // this is a fixed property of the fixture, not a flaky bound)
        assert(lo <= point && point <= hi,
          s"$src: point $point outside [$lo, $hi] ($oracleMode)")
        assert(!lo.isNaN && !hi.isNaN, s"$src: degenerate replicate")
      }
      // deterministic run-to-run
      val again = Sampling.poissonBootstrapCI(docs, oracleHash = oracleMode)
        .collect()
      assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
    }
  }

  test("waterfillAlloc: conservation, caps, and the saturation frontier") {
    val perSource = Seq(
      // (source, avail, weight): "tiny" floods at any level near 60%
      ("tiny", 10L, 5L),
      ("small", 900L, 3L),
      ("big", 10000L, 10L),
      ("huge", 50000L, 8L)).toDF("source", "avail", "weight")
    val out = Sampling.waterfillAlloc(perSource, budgetPermille = 600)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    val totalAvail = 10L + 900L + 10000L + 50000L
    val budget = totalAvail * 600L / 1000L
    assert(out.values.map(_._4).sum === budget,
      s"budget not conserved: $out")
    out.foreach { case (src, (a, _, sat, alloc)) =>
      assert(alloc <= a, s"$src allocated past availability")
      if (sat) assert(alloc === a, s"$src saturated but not taken whole")
    }
    // tiny floods: 10 avail vs a fair share of 5/26 · 36546 ≈ 7028
    assert(out("tiny")._3 && out("tiny")._4 === 10L)
    // huge cannot saturate at a 60% budget
    assert(!out("huge")._3)
    // deterministic
    val again = Sampling.waterfillAlloc(perSource, budgetPermille = 600)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(again === out.map { case (k, v) => k -> v._4 })
  }

  test("waterfillAlloc: budget above availability takes everything") {
    val perSource = Seq(("a", 100L, 1L), ("b", 50L, 9L))
      .toDF("source", "avail", "weight")
    val out = Sampling.waterfillAlloc(perSource, budgetPermille = 999)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // T = 149 of 150 available: b saturates (ratio 50/9 < 100/1),
    // a gets the remaining 99
    assert(out === Map("a" -> 99L, "b" -> 50L))
  }

  test("packTokenSpans: exact-length sequences, doc partition, conservation") {
    val out = Sampling.packTokenSpans(docs, seqLen = 128).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalTokens = docs
      .select(graft.functions.TextFunctions.tokenCount($"text").cast("long"))
      .collect().map(_.getLong(0)).sum
    // conservation: every token lands in exactly one slice
    assert(out.map(_._4).sum === totalTokens)
    // every sequence except the global tail is EXACTLY seqLen tokens
    val bySeq = out.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._4).sum }
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, len) =>
      if (s < lastSeq) assert(len === 128L, s"seq $s has $len tokens")
      else assert(len >= 1L && len <= 128L)
    }
    // the slices of one document tile [0, w) contiguously in seq order
    out.groupBy(_._2).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._1)
      assert(sorted.head._3 === 0L, s"doc $doc does not start at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._4 === b._3, s"doc $doc slices not contiguous")
          assert(a._1 + 1 === b._1, s"doc $doc skips a sequence")
        case _ => ()
      }
    }
    // a long document really does split: with 128-token sequences the
    // fixture must produce at least one multi-slice doc
    assert(out.groupBy(_._2).exists(_._2.length > 1),
      "no document crossed a sequence boundary — shrink seqLen")
  }

  test("poissonBootstrapCI: Poisson thresholds match the analytic CDF") {
    // T(j)/2^52 must reproduce P(X <= j) for X ~ Poisson(1); k = 7 tail
    // mass below 1e-4 (folded), thresholds strictly increasing
    val cdf = Sampling.PoissonCdf52.map(_.toDouble / 4503599627370496.0)
    var p = math.exp(-1.0); var c = 0.0
    (0 to 6).foreach { j =>
      if (j > 0) p /= j
      c += p
      assert(math.abs(cdf(j) - c) < 1e-12, s"threshold $j drifted")
    }
    assert(Sampling.PoissonCdf52 === Sampling.PoissonCdf52.sorted)
    assert(1.0 - cdf.last < 1e-4)
  }
}
