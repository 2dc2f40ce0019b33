package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(64)(r.nextFloat() * 2 - 1)
  }
  private def jitter(v: Array[Float], eps: Float): Array[Float] =
    v.zipWithIndex.map { case (x, i) => x + (if (i % 7 == 0) eps else 0f) }

  private lazy val planted = {
    val base = vec(1)
    Seq(
      (0L, base),
      (1L, jitter(base, 0.01f)), // near-duplicate of 0
      (2L, vec(2)), (3L, vec(3)), (4L, vec(4)), (5L, vec(5)),
      (6L, vec(6)), (7L, vec(7)), (8L, vec(8)), (9L, vec(9))
    ).toDF("vec_id", "embedding")
  }

  test("ivfBalance conserves mass and reports exact per-cell balance") {
    val out = Similarity.ivfBalance(planted).collect()
    assert(out.map(_.getLong(1)).sum === 10L, "cell counts must cover the corpus")
    val nCells = out.length.toLong
    out.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1).toDouble / 10.0, "share")
      assert(r.getDouble(3) === (r.getLong(1) * nCells).toDouble / 10.0, "balance")
    }
    // cells are sorted and unique
    val cells = out.map(_.getLong(0))
    assert(cells.toSeq === cells.sorted.toSeq && cells.distinct.length === cells.length)
  }

  test("cosine of identical vectors is ~1, self-consistent fold") {
    val df = planted.filter($"vec_id" === 0)
      .select(Similarity.cosine($"embedding", $"embedding").as("c"))
    assert(math.abs(df.head.getDouble(0) - 1.0) < 1e-12)
  }

  test("bruteForceKnn ranks the planted near-duplicate first") {
    val res = Similarity.bruteForceKnn(
      planted, planted.filter($"vec_id" === 0), k = 3).collect()
    assert(res.head.getLong(1) === 1L) // rank 1 = the jittered copy
    assert(res.head.getDouble(2) > 0.99)
  }

  test("embeddingNearDupes finds the planted pair via LSH buckets") {
    val pairs = Similarity.embeddingNearDupes(planted, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("annLsh top-1 matches brute force for the planted near-dup") {
    val ann = Similarity.annLsh(
      planted, planted.filter($"vec_id" === 0), k = 3)
    val top = ann.collect().head
    assert(top.getLong(1) === 1L)
  }

  test("ivfSearch returns ranked candidates with exact cosines") {
    val res = Similarity.ivfSearch(
      planted, planted.filter($"vec_id" === 0), k = 3, nProbe = 2).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getInt(3)).toSeq === (1 to res.length))
  }

  test("multi-table LSH candidates contain every single-table pair") {
    // table 0 of the 4-table run uses the same seed as the 1-table run,
    // so its pair set can only grow: more tables = more chances to collide
    def pairs(tables: Int): Set[(Long, Long)] =
      Similarity.embeddingNearDupes(planted, threshold = 0.3,
        nBits = 4, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    val four = pairs(4)
    assert(one.subsetOf(four))
    assert(four.contains((0L, 1L))) // the planted near-dup always survives
    // and every reported pair really clears the exact-cosine threshold
    Similarity.embeddingNearDupes(planted, threshold = 0.3,
      nBits = 4, tables = 4)
      .collect().foreach(r => assert(r.getDouble(2) >= 0.3))
  }

  test("signature is deterministic across invocations") {
    val planes = Similarity.hyperplanes(8, 64)
    val s1 = planted.select(Similarity.signature($"embedding", planes).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val s2 = planted.select(Similarity.signature($"embedding", planes).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(s1 === s2)
  }

  test("knnRandomProjection ranks the planted near-dup first in reduced space") {
    // the 0/1 pair is nearly identical, so even after 64→16 reduction it
    // must stay each other's top neighbour (JL distortion ≪ the gap)
    val top = Similarity.knnRandomProjection(
      planted, planted.filter($"vec_id" === 0L), k = 1).collect()
    assert(top.length === 1)
    assert(top(0).getLong(1) === 1L)
  }

  test("randomProject emits one fold per plane, deterministically") {
    val planes = Similarity.hyperplanes(16, 64, seed = 99L)
    val r = planted.select(
      Similarity.randomProject($"embedding", planes).as("r"))
      .collect().map(_.getSeq[Double](0))
    assert(r.forall(_.length === 16))
    val r2 = planted.select(
      Similarity.randomProject($"embedding", planes).as("r"))
      .collect().map(_.getSeq[Double](0))
    assert(r.map(_.toList).toList === r2.map(_.toList).toList)
  }

  test("kmeansStep conserves vectors, bounds moves, and is reproducible") {
    val corpus = graft.Tables.load(spark, sf0001, "embeddings")
    val out = Similarity.kmeansStep(corpus).collect()
    val n = corpus.count()
    assert(out.map(_.getLong(1)).sum === n) // every vector lands in a cell
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1)) // moved ≤ n
      assert(r.getSeq[Double](3).length === 64)
    }
    val again = Similarity.kmeansStep(corpus).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("pqAdc ranks the planted near-duplicate first and is reproducible") {
    // identical subvectors encode to identical codes, so the planted
    // near-dup shares the query's code in every subspace — its ADC
    // score is (within quantization) the query's own self-score
    val res = Similarity.pqAdc(
      planted, planted.filter($"vec_id" === 0), k = 3).collect()
    assert(res.head.getLong(1) === 1L, res.toSeq)
    val again = Similarity.pqAdc(
      planted, planted.filter($"vec_id" === 0), k = 3).collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("pqIvfAdc ranks the planted near-duplicate first and is reproducible") {
    // the near-dup shares the query's coarse cell AND (identical
    // residual, within jitter) its residual codes, so its IVFADC score
    // is the query's own self-score up to quantization
    val res = Similarity.pqIvfAdc(
      planted, planted.filter($"vec_id" === 0), k = 3).collect()
    assert(res.head.getLong(1) === 1L, res.toSeq)
    val again = Similarity.pqIvfAdc(
      planted, planted.filter($"vec_id" === 0), k = 3).collect()
    assert(res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("pqIvfAdc candidates stay inside the probed coarse cells") {
    // IVFADC must inherit IVF's candidate restriction: every returned
    // vec_id's coarse cell is one of the query's nProbe probed cells
    val planes = Similarity.hyperplanes(4, 64, seed = 7L)
    val cellOf = planted
      .select($"vec_id", Similarity.signature($"embedding", planes).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val res = Similarity.pqIvfAdc(
      planted, planted.filter($"vec_id" === 0), k = 20, nProbe = 2).collect()
    val candCells = res.map(r => cellOf(r.getLong(1))).toSet
    assert(candCells.size <= 2, res.toSeq)
  }

  test("pqIvfAdcRerank: exact scores on the shortlist, near-dup at rank 1") {
    val q = planted.filter($"vec_id" === 0)
    val rr = Similarity.pqIvfAdcRerank(planted, q, k = 3, shortlist = 5)
      .collect()
    assert(rr.head.getLong(1) === 1L) // refinement keeps the true neighbor first
    // every reported score is the TRUE cosine, not the quantized one
    val byId = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def trueCos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      def nrm(v: Array[Double]) =
        math.sqrt(v.map(x => x * x).foldLeft(0.0)(_ + _))
      dot / (nrm(ad) * nrm(bd))
    }
    rr.foreach { r =>
      val expect = trueCos(byId(0L), byId(r.getLong(1)))
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"rerank score for ${r.getLong(1)} is not the exact cosine")
    }
    // ranks are 1..k in exact-cosine order
    assert(rr.map(_.getInt(3)).toSeq === (1 to rr.length))
    assert(rr.map(_.getDouble(2)).toSeq.reverse.sorted.reverse
      === rr.map(_.getDouble(2)).toSeq)
  }

  test("hardNegatives: near-dup excluded, ranks re-number below the ceiling") {
    val q = planted.filter($"vec_id" === 0)
    // brute top-1 is the planted near-dup (cos > 0.99)…
    val brute = Similarity.bruteForceKnn(planted, q, k = 3).collect()
    assert(brute.head.getLong(1) === 1L)
    // …but the hard-negative set must exclude it and stay under the ceiling
    val hn = Similarity.hardNegatives(planted, q, k = 3, dupCeiling = 0.9)
      .collect()
    assert(!hn.map(_.getLong(1)).contains(1L),
      "near-duplicate leaked into the hard negatives")
    assert(hn.forall(_.getDouble(2) < 0.9))
    assert(hn.map(_.getInt(3)).toSeq === (1 to hn.length))
  }

  test("pqAdc emits exactly m codes per vector (the compressed index)") {
    // the index the operator builds is codes-only: every corpus vector
    // must land on exactly one centroid per subspace
    val k = Similarity.pqAdc(planted, planted.filter($"vec_id" === 0), k = 20)
      .collect()
    // 9 candidates (self excluded), all scored from 4 code lookups
    assert(k.length === 9, k.toSeq)
    assert(k.forall(r => !r.isNullAt(2)), k.toSeq) // all four subspaces matched
  }

  test("labelCentroidConfusion: separable planted classes land on the diagonal") {
    // two tight clusters around orthogonal-ish bases — every vector must
    // be assigned to its own class centroid, and counts must conserve
    val a = vec(11); val b = vec(12)
    val labeled = (0 until 6).map { i =>
      if (i < 3) (i.toLong, jitter(a, 0.02f * (i + 1)), 0)
      else (i.toLong, jitter(b, 0.02f * (i - 2)), 1)
    }.toDF("vec_id", "embedding", "label")
    val conf = Similarity.labelCentroidConfusion(labeled).collect()
    assert(conf.map(_.getLong(2)).sum === 6, conf.toSeq) // counts conserve
    val diag = conf.filter(r => r.getLong(0) == r.getLong(1)).map(_.getLong(2)).sum
    assert(diag === 6, conf.toSeq) // perfectly separable → all diagonal
    // schema contract: all-int64 output (driver compare rule)
    val out = Similarity.labelCentroidConfusion(labeled)
    assert(out.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType), out.schema)
  }

  test("kCenterCoreset: hand-computed farthest-point traversal + tiebreak") {
    // 1-D line at exactly-representable positions (binary fractions, so
    // floor(x·1e6) is drift-free): 0, .5, .0625, .25, .4375 → greedy
    // picks seed 0, farthest 1, then 3, then the md-tie (2,4) broken by
    // vec_id. Radii are the integer max-min squared distances at pick
    // time — the k-center cost curve.
    def e(x: Float) = Array(x, 0f, 0f, 0f)
    val pts = Seq((0L, e(0f)), (1L, e(0.5f)), (2L, e(0.0625f)),
      (3L, e(0.25f)), (4L, e(0.4375f))).toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(pts, k = 5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 0L, 0L), (1L, 1L, 250000000000L), (2L, 3L, 62500000000L),
        (3L, 2L, 3906250000L), (4L, 4L, 3906250000L)))
    // deterministic: a second run is bit-identical
    val again = Similarity.kCenterCoreset(pts, k = 5).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("dominantDirection recovers a planted principal axis, partition-invariant") {
    // corpus = ±u plus small orthogonal noise → the second-moment
    // matrix's top eigenvector is u; after 8 integer iterations the
    // 256-scaled v must align with u (|cos| > 0.95 — sign is init-
    // dependent and irrelevant for ABTT removal)
    val u = vec(21).map(x => x * 0.4f)
    val rows = (0 until 40).map { r =>
      val sign = if (r % 2 == 0) 1f else -1f
      val noise = vec(100 + r).map(_ * 0.02f)
      (r.toLong, u.zip(noise).map { case (a, b) => sign * a + b })
    }.toDF("vec_id", "embedding")
    val v = Similarity.dominantDirection(rows).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    val cos = {
      val dot = v.zip(u).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(u.map(x => x.toDouble * x).sum))
    }
    assert(math.abs(cos) > 0.95, s"cos=$cos")
    // integer sums are order-independent → repartitioning is a no-op
    val again = Similarity.dominantDirection(rows.repartition(7)).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    assert(v.toSeq === again.toSeq)
  }

  test("prefixDimRecall: 1.0 when the prefix carries the signal, low when it doesn't") {
    // corpus A: all signal in dims 0-15 (rest zero) → prefix ranking
    // must equal the full ranking, recall 1.0 for every query
    def frontLoaded(seed: Int) = {
      val v = vec(seed)
      v.zipWithIndex.map { case (x, i) => if (i < 16) x else 0f }
    }
    val a = (0L until 12L).map(i => (i, frontLoaded(40 + i.toInt)))
      .toDF("vec_id", "embedding")
    val ra = Similarity.prefixDimRecall(
      a, a.filter($"vec_id" < 2), k = 5, prefixDim = 16).collect()
    assert(ra.forall(_.getDouble(2) === 1.0), ra.toSeq)
    // corpus B: all signal in dims 48-63 (prefix is ZERO — cosine over
    // the prefix is NaN/undefined) → overlap must be reported, not
    // crash; every query still gets a row (right-join contract)
    def backLoaded(seed: Int) = {
      val v = vec(seed)
      v.zipWithIndex.map { case (x, i) => if (i >= 48) x else 0f }
    }
    val b = (0L until 12L).map(i => (i, backLoaded(60 + i.toInt)))
      .toDF("vec_id", "embedding")
    val rb = Similarity.prefixDimRecall(
      b, b.filter($"vec_id" < 2), k = 5, prefixDim = 16).collect()
    assert(rb.length === 2, rb.toSeq)
  }

  test("topAligned ranks a pure-axis vector first with alignment ~1") {
    val u = vec(21).map(x => x * 0.4f)
    val rows = ((0 until 20).map { r =>
      val sign = if (r % 2 == 0) 1f else -1f
      val noise = vec(200 + r).map(_ * 0.05f)
      (r.toLong, u.zip(noise).map { case (a, b) => sign * a + b })
    } :+ ((99L, u))).toDF("vec_id", "embedding") // 99 IS the axis
    val top = Similarity.topAligned(rows, k = 5).collect()
    assert(top.head.getLong(0) === 99L, top.toSeq)
    assert(top.head.getDouble(1) > 0.99, top.toSeq)
    assert(top.forall(r => r.getDouble(1) <= 1.0 + 1e-12), top.toSeq)
  }

  test("mmrRerank diversifies: the redundant near-twin loses to the distinct hit") {
    // q = e0; a-cluster at cos 0.85 (ids 1, 2 -- parallel vectors, so
    // sim(a1,a2) = 1); b at cos 0.8 but only 0.68 similar to the
    // cluster; c is noise. Plain top-2 = (a1, a2); MMR round 2 scores
    // a2 at 0.7*0.85 - 0.3*1.0 = 0.295 vs b at 0.7*0.8 - 0.3*0.68 =
    // 0.356 -- the diversification flip this operator exists for.
    val q = Array(1f, 0f, 0f, 0f)
    val a1 = Array(0.85f, 0.52678f, 0f, 0f)
    val a2 = a1.map(_ * 1.02f) // same direction: cos ties, id breaks
    val b = Array(0.8f, 0f, 0.6f, 0f)
    val c = Array(0.1f, 0f, 0f, 0.99f)
    val df = Seq((0L, q), (1L, a1), (2L, a2), (3L, b), (4L, c))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(df, df.filter($"vec_id" === 0), k = 2, m = 4)
      .select($"mmr_rank", $"vec_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 3L)), out)
    // sanity: plain top-2 would have been the redundant pair (1, 2)
    val plain = Similarity.bruteForceKnn(df, df.filter($"vec_id" === 0), k = 2)
      .select($"vec_id").as[Long].collect().toSeq
    assert(plain === Seq(1L, 2L), plain)
  }

  test("mmrRerank first pick equals the exact top-1 and emits k rows per query") {
    val df = (0L to 9L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(df, df.filter($"vec_id" < 2), k = 4, m = 8)
      .localCheckpoint()
    assert(out.count() === 8L) // 2 queries x k
    val top1 = Similarity.bruteForceKnn(df, df.filter($"vec_id" < 2), k = 1)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val first = out.filter($"mmr_rank" === 1)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(first === top1)
    // selections are distinct per query
    assert(out.select($"q_id", $"vec_id").distinct().count() === 8L)
  }

  test("centroidDrift: identical populations give cos 1; opposite give -1") {
    import spark.implicits._
    val v1 = Array(0.5f, 0.25f, -0.125f, 1.0f)
    val v2 = Array(0.1f, 0.9f, 0.3f, -0.2f)
    val same = Seq((0L, v1), (0L, v2), (1L, v1), (1L, v2))
      .toDF("label", "embedding")
    val r1 = Similarity.centroidDrift(same, col("label"), "embedding", 0L, 1L)
      .head()
    assert(r1.getLong(0) === 2L && r1.getLong(1) === 2L)
    assert(r1.getDouble(2) === 1.0, r1)
    val opp = Seq((0L, v1), (1L, v1.map(-_))).toDF("label", "embedding")
    val r2 = Similarity.centroidDrift(opp, col("label"), "embedding", 0L, 1L)
      .head()
    assert(r2.getDouble(2) === -1.0, r2)
  }

  test("dbscan: planted geometry yields the hand-derived core/border/noise split") {
    import spark.implicits._
    // unit circle: cosine(u(α), u(β)) = cos(α−β); threshold 0.95 ≈ 18.2°
    def u(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // cluster A at 0°/5°/10° (all pairwise ≤ 10° → mutual neighbors),
    // a border at 25° (only 10° is within 18.2°), noise at 90°, and an
    // ISOLATED core at 240° whose two neighbors (230°, 250°) are 20°
    // apart from each other — non-core, so 240° has no core neighbor
    // and must become its own singleton cluster
    val pts = Seq(0.0 -> 0L, 5.0 -> 1L, 10.0 -> 2L, 25.0 -> 3L,
      90.0 -> 4L, 240.0 -> 5L, 230.0 -> 6L, 250.0 -> 7L)
    val df = pts.map { case (deg, id) => (id, u(deg)) }
      .toDF("vec_id", "embedding")
    val out = Similarity.dbscan(df, threshold = 0.95, minPts = 3)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap
    assert(out(0L) === ((2L, "core", 0L)))
    assert(out(1L) === ((2L, "core", 0L)))
    assert(out(2L) === ((3L, "core", 0L)))
    assert(out(3L) === ((1L, "border", 0L)), "border attaches to cluster 0")
    assert(out(4L) === ((0L, "noise", -1L)))
    assert(out(5L) === ((2L, "core", 5L)), "isolated core = singleton cluster")
    assert(out(6L) === ((1L, "border", 5L)))
    assert(out(7L) === ((1L, "border", 5L)))
  }

  // ---- semantic decontamination (d69) ----

  test("semanticDecontam flags the planted paraphrase, passes orthogonal docs") {
    // bench: ids 0-4 on distinct axes; corpus: 10 = jittered copy of
    // bench 2 (the paraphrase), 11 = orthogonal, 12 = mild mixture
    def axis(i: Int, extra: (Int, Float)*): Array[Float] = {
      val v = Array.fill(8)(0f); v(i) = 1f
      extra.foreach { case (j, x) => v(j) += x }; v
    }
    val emb = Seq(
      (0L, axis(0)), (1L, axis(1)), (2L, axis(2)), (3L, axis(3)), (4L, axis(4)),
      (10L, axis(2, 5 -> 0.05f)), // near-copy of bench 2
      (11L, axis(6)), // orthogonal to every bench item
      (12L, axis(0, 1 -> 1f)) // equal mixture of bench 0 and 1: cos ~ 0.707
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontam(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out(10L)._1 === 2L && out(10L)._3, s"paraphrase must flag: $out")
    assert(out(10L)._2 > 0.99)
    assert(out(11L)._2 === 0.0 && !out(11L)._3)
    assert(out(11L)._1 === 0L, "tie on cos 0 breaks to the smallest bench id")
    assert(!out(12L)._3, "a 0.707 mixture stays under the 0.8 cut")
    assert(out(12L)._1 === 0L)
  }

  // ---- margin-based bitext mining (s65) ----

  /** The hubness construction the margin criterion exists for: every
    * probe's RAW-cosine best partner is one hub vector (a shared
    * dominant direction), so raw mutual-best mines exactly ONE pair and
    * loses the rest; the margin subtracts each side's neighborhood mean,
    * demoting the hub (whose own neighborhood is uniformly hot) and
    * recovering all four planted couples. */
  private lazy val hubbed = {
    // 5 dims; g = e4 the hub direction. xs (even ids) = g + 0.5·e_i;
    // planted partners (odd id 2i+1) = e_i + 0.2·g — FURTHER from their
    // x than the hub is (cos ≈ 0.61 vs 0.89); hub (id 9) = g.
    def e(i: Int, a: Float, gw: Float): Array[Float] = {
      val v = Array.fill(5)(0f); v(i) = a; v(4) += gw; v
    }
    Seq(
      (0L, e(0, 0.5f, 1f)), (2L, e(1, 0.5f, 1f)),
      (4L, e(2, 0.5f, 1f)), (6L, e(3, 0.5f, 1f)),
      (1L, e(0, 1f, 0.2f)), (3L, e(1, 1f, 0.2f)),
      (5L, e(2, 1f, 0.2f)), (7L, e(3, 1f, 0.2f)),
      (9L, e(0, 0f, 1f))
    ).toDF("vec_id", "embedding")
  }

  test("bitextMine: margin recovers all planted couples the hub eats under raw cosine") {
    // raw-cosine mutual best, computed inline as the baseline
    import org.apache.spark.sql.expressions.Window
    val x = hubbed.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("x_id"), col("embedding").as("x_emb"))
    val y = hubbed.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("y_emb"))
    val scored = y.join(broadcast(x), col("y_id") =!= col("x_id"))
      .select(col("x_id"), col("y_id"),
        Similarity.cosine(col("x_emb"), col("y_emb")).as("cos"))
    val bx = scored.withColumn("r", row_number().over(
        Window.partitionBy("x_id").orderBy(col("cos").desc, col("y_id"))))
      .filter(col("r") === 1).select("x_id", "y_id")
    val by = scored.withColumn("r", row_number().over(
        Window.partitionBy("y_id").orderBy(col("cos").desc, col("x_id"))))
      .filter(col("r") === 1).select("x_id", "y_id")
    val rawPairs = bx.join(by, Seq("x_id", "y_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hub is every x's raw argmax, so raw mutuality mines ONE pair
    assert(rawPairs === Set((0L, 9L)), s"raw baseline drifted: $rawPairs")

    val mined = Similarity.bitextMine(hubbed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(mined.map(p => (p._1, p._2)).toSet ===
      Set((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L)),
      s"margin mining missed planted couples: ${mined.toSeq}")
    assert(mined.forall(_._3 > 0.0), "planted couples should score positive margin")
  }

  test("bitextMine: hand-computed margin on an exact-cosine frame") {
    // x = (1,0); ys on the exact-value grid: cos ∈ {1, 0.8, 0.6, 0, -1}
    val tiny = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(1f, 0f)), (3L, Array(4f, 3f)), (5L, Array(0f, 1f)),
      (7L, Array(-1f, 0f)), (9L, Array(3f, 4f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bitextMine(tiny).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1)) === ((0L, 1L)))
    assert(r.getDouble(2) === 1.0)
    // top-4 of x: cos {1, 0.8, 0.6, 0} → scaled sum 2.4e12 over 4 terms;
    // y1's neighborhood is just x (cos 1). Same double DAG as the op.
    val expected = 1.0 - 0.5 *
      (2.4e12 / (4.0 * 1e12) + 1.0e12 / (1.0 * 1e12))
    assert(r.getDouble(3) === expected)
  }
}
