package graft.operators

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(10L)),
    (2L, Some("b"), None),
    (3L, Some("a"), Some(30L)),
    (4L, None, Some(10L))
  ).toDF("id", "tag", "score")

  test("columnProfile: one row per column with exact stats, one scan") {
    val out = Profiling.columnProfile(df, Seq("id", "tag", "score"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(out.keySet === Set("id", "tag", "score"))
    assert(out("id") === ((4L, 0L, 4L, "1", "4")))
    // nulls excluded from distinct and min/max, counted in n_null
    assert(out("tag") === ((4L, 1L, 2L, "a", "b")))
    assert(out("score") === ((4L, 1L, 2L, "10", "30")))
  }

  test("columnProfile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(df, Seq.empty)
    }
  }

  test("rowExpectations: one row per check; NULL predicate is a violation") {
    import org.apache.spark.sql.functions._
    val out = Profiling.rowExpectations(df, Seq(
        "id_positive" -> (col("id") > 0),
        "score_min" -> (col("score") >= 20L))) // NULL for id=2 → violation
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("id_positive") === ((4L, 0L, true)))
    // score >= 20 fails for 10, 10 and for the NULL row: 3 violations
    assert(out("score_min") === ((4L, 3L, false)))
  }

  test("rowExpectations rejects an empty check list") {
    intercept[IllegalArgumentException] {
      Profiling.rowExpectations(df, Seq.empty)
    }
  }

  test("uniqueExpectation counts rows beyond the first per key") {
    val r = Profiling.uniqueExpectation(df, "tag_unique", Seq("tag"))
      .collect().head
    // tags: a,b,a,NULL → countDistinct skips NULL: 4−2 = 2 violations
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) === ((4L, 2L, false)))
    val ok = Profiling.uniqueExpectation(df, "id_unique", Seq("id"))
      .collect().head
    assert((ok.getLong(2), ok.getBoolean(3)) === ((0L, true)))
  }

  test("keySkew: exact Gini on a hand-computable distribution") {
    // keys: a×1, b×1, c×2, d×4 → sorted counts (1,1,2,4), k=4, T=8
    // S = Σ i·x_i = 1·1 + 2·1 + 3·2 + 4·4 = 25
    // G = 2·25/(4·8) − 5/4 = 1.5625 − 1.25 = 0.3125
    val rows = (Seq("a", "b") ++ Seq.fill(2)("c") ++ Seq.fill(4)("d"))
      .toDF("k")
    val r = Profiling.keySkew(rows, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 8L, 4L)))
    assert(r.getDouble(3) === 0.5) // max_share = 4/8
    assert(r.getDouble(4) === 0.3125)
  }

  test("keySkew: uniform keys have Gini 0") {
    val rows = (0 until 6).map(i => s"k${i % 3}").toDF("k")
    val r = Profiling.keySkew(rows, "k").collect().head
    assert(r.getDouble(4) === 0.0)
  }

  test("exactQuantiles: type-1 (quantile_disc) semantics per group") {
    // group g1: values 1..10 once each (n=10):
    //   q=0.25 → ceil(2.5)=3 → 3; q=0.5 → 5; q=0.9 → ceil(9)=9 → 9; q=1 → 10
    // group g2: (1,1,1,9) (n=4): q=0.5 → ceil(2)=2 → 1; q=0.9 → ceil(3.6)=4 → 9
    val rows = ((1 to 10).map(v => ("g1", v.toLong)) ++
      Seq(("g2", 1L), ("g2", 1L), ("g2", 1L), ("g2", 9L))).toDF("g", "v")
    val out = Profiling.exactQuantiles(rows, "g", "v",
      Seq(0.25, 0.5, 0.9, 1.0)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    assert(out(("g1", 0.25)) === 3L)
    assert(out(("g1", 0.5)) === 5L)
    assert(out(("g1", 0.9)) === 9L)
    assert(out(("g1", 1.0)) === 10L)
    assert(out(("g2", 0.5)) === 1L)
    assert(out(("g2", 0.9)) === 9L)
  }

  test("referentialExpectation counts orphan child rows") {
    val parent = Seq(10L, 30L).toDF("pk")
    val r = Profiling.referentialExpectation(df, "score", parent, "pk",
      "score_in_parent").collect().head
    // child keys 10, NULL, 30, 10 — the NULL never matches → 1 orphan
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) === ((4L, 1L, false)))
  }

  test("kAnonymityLadder: class rollup per level, minimal generalization visible") {
    // (city,seg): a/x=3, a/y=1, b/x=2 → at k=3 two small classes, 3 rows
    // (city):     a=4, b=2          → one small class, 2 rows
    // ():         one class of 6    → satisfied (full suppression always is)
    val rows = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("city", "seg")
    val out = Profiling.kAnonymityLadder(rows,
      Seq(Seq("city", "seg"), Seq("city"), Seq.empty), k = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toList
    assert(out === List(
      (0L, "city,seg", 3L, 2L, 3L, false),
      (1L, "city", 2L, 1L, 2L, false),
      (2L, "", 1L, 0L, 0L, true)))
  }

  test("kAnonymityLadder rejects a coarser level outside the finest columns") {
    val rows = Seq(("a", "x")).toDF("city", "seg")
    assertThrows[IllegalArgumentException](
      Profiling.kAnonymityLadder(rows, Seq(Seq("city"), Seq("seg")), k = 2L))
  }

  test("lDiversityLadder: a k-large but single-valued class is flagged") {
    // city a: 4 rows, ALL disease d1 → k-anonymous at k=4 yet diversity 1
    // city b: 3 rows over d1,d2      → diversity 2
    val rows = Seq(("a", "d1"), ("a", "d1"), ("a", "d1"), ("a", "d1"),
      ("b", "d1"), ("b", "d2"), ("b", "d2")).toDF("city", "disease")
    val out = Profiling.lDiversityLadder(rows,
      Seq(Seq("city"), Seq.empty), sensitive = "disease", l = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toList
    assert(out === List(
      // level 0: classes a (dv=1, 4 rows at risk) and b (dv=2)
      (0L, "city", 2L, 1L, 4L, 1L, false),
      // suppression: one class, both diseases → satisfied
      (1L, "", 1L, 0L, 0L, 2L, true)))
  }

  test("lDiversityLadder diversity counts distinct values, not rows") {
    // one class of 6 rows but only 3 distinct sensitive values
    val rows = Seq.tabulate(6)(i => ("a", s"v${i % 3}")).toDF("g", "s")
    val out = Profiling.lDiversityLadder(rows, Seq(Seq("g")), "s", l = 4L)
      .collect()(0)
    assert(out.getLong(5) === 3L, s"min_diversity: $out") // not 6
    assert(out.getLong(4) === 6L, "all 6 rows at risk under l=4")
  }

  test("confusionMatrix: exact cells; diagonal share is per-class recall") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("t", "p")
    val out = Profiling.confusionMatrix(df, "t", "p").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("a", "a") -> ((2L, 2.0 / 3.0)),
      ("a", "b") -> ((1L, 1.0 / 3.0)),
      ("b", "b") -> ((1L, 1.0))))
  }

  test("cohenKappa: exact chance-corrected agreement") {
    import spark.implicits._
    // N=4, A=3, marginals r=(3,1), c=(2,2) -> Σrc=8, κ=(12−8)/(16−8)=0.5
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("t", "p")
    val r = Profiling.cohenKappa(df, "t", "p").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      === ((4L, 3L, 8L, 0.5)))
    // two-class perfect agreement -> κ = 1; one-class degenerate -> 0
    val perfect = Seq(("a", "a"), ("b", "b")).toDF("t", "p")
    assert(Profiling.cohenKappa(perfect, "t", "p").collect()(0).getDouble(3) === 1.0)
    val degen = Seq(("a", "a"), ("a", "a")).toDF("t", "p")
    assert(Profiling.cohenKappa(degen, "t", "p").collect()(0).getDouble(3) === 0.0)
  }

  test("simpsonDiversity: exact concentration and effective labels") {
    import spark.implicits._
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"), // D=6/12, eff=2
      ("g2", "a"), ("g2", "b"),                           // num=0 -> 0/0 guard
      ("g3", "a")                                         // n<2 guard
    ).toDF("g", "l")
    val out = Profiling.simpsonDiversity(df, "g", "l").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out === Map(
      "g1" -> ((4L, 2L, 0.5, 2.0)),
      "g2" -> ((2L, 2L, 0.0, 0.0)),
      "g3" -> ((1L, 1L, 0.0, 0.0))))
  }

  test("trimmedMean drops the outlier tail the plain mean can't survive") {
    import spark.implicits._
    val df = ((1L to 9L) :+ 1000L).map(v => ("x", v)).toDF("g", "v")
    val r = Profiling.trimmedMean(df, "g", "v").collect()(0)
    // p10 threshold 1, p90 threshold 9 -> keep 1..9: mean 5 (plain: 104.9)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === ((9L, 45L, 5.0)))
  }

  test("fdViolations reports holding and broken FDs with exact counts") {
    import spark.implicits._
    val df = Seq(
      ("g1", "v1"), ("g1", "v1"),           // g1: 1 distinct -> ok
      ("g2", "v1"), ("g2", "v2"), ("g2", "v3"), // g2: 3 distinct
      ("g3", "v1"), ("g3", "v2")            // g3: 2 distinct
    ).toDF("x", "y")
    val broken = Profiling.fdViolations(df, "x->y", Seq("x"), "y").collect()(0)
    assert(broken.getString(0) === "x->y")
    assert((broken.getLong(1), broken.getLong(2), broken.getLong(3),
      broken.getBoolean(4)) === ((3L, 2L, 3L, false)))
    val holds = Profiling.fdViolations(df, "y->y", Seq("y"), "y").collect()(0)
    assert((holds.getLong(2), holds.getBoolean(4)) === ((0L, true)))
  }

  test("tCloseness: exact scaled TVD, absent values count, strict breach") {
    import spark.implicits._
    // global: a=5, b=4, N=9
    val df = (Seq.fill(3)(("g1", "a")) ++ Seq(("g1", "b")) ++
      Seq(("g2", "a")) ++ Seq.fill(3)(("g2", "b")) ++
      Seq(("g3", "a"))).toDF("q", "s")
    val out = Profiling.tCloseness(df, Seq("q"), "s", tNum = 2L, tDen = 5L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      // g1: |3*9-5*4| + |1*9-4*4| = 14, tvd 14/72
      ("g1", 4L, 14L, 14.0 / 72.0, false),
      // g2: |1*9-5*4| + |3*9-4*4| = 22
      ("g2", 4L, 22L, 22.0 / 72.0, false),
      // g3 has NO 'b' rows: |1*9-5| + |0-4| = 8, tvd 8/18 > 2/5 -> breach
      ("g3", 1L, 8L, 8.0 / 18.0, true)))
  }

  test("weightedQuantiles: the token-weighted median sits in the long doc") {
    import spark.implicits._
    // group a: values 1,2 (weight 1 each) and 10 (weight 8): total 10.
    // Doc-count median would be 2; the WEIGHTED median (and p75/p90)
    // is 10 because the long doc owns 80% of the weight. p10 -> 1.
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 10L, 8L),
      ("b", 5L, 3L), ("b", 7L, 1L)).toDF("g", "v", "w")
    val out = Profiling.weightedQuantiles(df, "g", "v", "w",
        qs = Seq(10, 50, 75, 90))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("a", 10L, 1L), ("a", 50L, 10L), ("a", 75L, 10L), ("a", 90L, 10L),
      // b: cum(5)=3 of 4 -> covers 10/50/75 (3*100 >= 75*4); 90 -> 7
      ("b", 10L, 5L), ("b", 50L, 5L), ("b", 75L, 5L), ("b", 90L, 7L)))
  }
}
