package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnelDepths enforces strict step order per entity") {
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 11:00:00"), 2L),
      (1L, "purchase", ts("2024-01-01 12:00:00"), 3L),
      // user 2: purchase BEFORE click -> depth stops at 1
      (2L, "signup", ts("2024-01-01 10:00:00"), 4L),
      (2L, "purchase", ts("2024-01-01 11:00:00"), 5L),
      // user 3: click precedes signup -> that click cannot count
      (3L, "click", ts("2024-01-01 09:00:00"), 6L),
      (3L, "signup", ts("2024-01-01 10:00:00"), 7L),
      // user 4: no signup at all -> absent from the output
      (4L, "click", ts("2024-01-01 10:00:00"), 8L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.funnelDepths(ev, "user_id", "event_type",
      EventAnalytics.eventKey($"ts", $"event_id"),
      Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L)) // depth 1: users 2,3; depth 3: user 1
  }

  test("funnelDepths requires strictly-after, not same-key") {
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 10:00:00"), 5L),
      (1L, "click", ts("2024-01-01 10:00:00"), 4L) // earlier seq, same second
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.funnelDepths(ev, "user_id", "event_type",
      EventAnalytics.eventKey($"ts", $"event_id"),
      Seq("signup", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L)) // the click sorts before the signup
  }

  test("retentionCohorts counts distinct actives per (cohort, offset)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday, cohort week 1
      (1L, ts("2024-01-02 10:00:00")), // same week, still one active
      (1L, ts("2024-01-08 10:00:00")), // week offset 1
      (2L, ts("2024-01-01 12:00:00")), // same cohort as user 1
      (3L, ts("2024-01-08 12:00:00"))  // later cohort, offset 0
    ).toDF("user_id", "ts")
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 0L, 2L), // users 1,2 in week-1 cohort
      ("2024-01-01 00:00:00.0", 1L, 1L), // user 1 retained
      ("2024-01-08 00:00:00.0", 0L, 1L))) // user 3's own cohort
  }

  test("mergeAggSnapshots combines counts and sums across batches") {
    val snap = Seq((1L, 2L, BigDecimal("10.50")), (2L, 1L, BigDecimal("5.00")))
      .toDF("k", "n", "total")
      .select($"k", $"n", $"total".cast("decimal(18,2)").as("total"))
    val batch = Seq((2L, 3L, BigDecimal("7.25")), (3L, 1L, BigDecimal("1.00")))
      .toDF("k", "n", "total")
      .select($"k", $"n", $"total".cast("decimal(18,2)").as("total"))
    val out = EventAnalytics.mergeAggSnapshots(snap, batch, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString))
    assert(out.toSeq === Seq(
      (1L, 2L, "10.50"), (2L, 4L, "12.25"), (3L, 1L, "1.00")))
  }

  test("histogramPercentiles reports the bin upper bound at each quantile") {
    // 100 values 0..99, width 10: bins 0..9 with 10 values each.
    // q=0.5 -> first bin where cum >= 50 -> bin 4 -> upper bound 49
    val df = (0L until 100L).toDF("v")
    val out = EventAnalytics.histogramPercentiles(
      df, $"v", binWidth = 10L, quantiles = Seq(0.5, 0.9, 0.99))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq === Seq((0.5, 49L), (0.9, 89L), (0.99, 99L)))
  }

  test("transitionMatrix counts ordered pairs with row-normalized p") {
    // user 1: a → b → b; user 2: a → c
    // transitions: (a,b)=1, (b,b)=1, (a,c)=1 → p(a→b)=p(a→c)=0.5, p(b→b)=1
    val ev = Seq(
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 10:00:01"), 2L),
      (1L, "b", ts("2024-01-01 10:00:02"), 3L),
      (2L, "a", ts("2024-01-01 10:00:00"), 4L),
      (2L, "c", ts("2024-01-01 10:00:01"), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.transitionMatrix(ev, "user_id", "event_type",
      EventAnalytics.eventKey($"ts", $"event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "b", 1L, 1.0)))
  }

  test("transitionMatrix breaks same-second ties by the sequence id") {
    // both events share the second; event_id order decides prev/next
    val ev = Seq(
      (1L, "x", ts("2024-01-01 10:00:00"), 7L),
      (1L, "y", ts("2024-01-01 10:00:00"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.transitionMatrix(ev, "user_id", "event_type",
      EventAnalytics.eventKey($"ts", $"event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq === Seq(("y", "x")))
  }

  test("trajectoryTopK ranks the identical journey first (q156)") {
    // users 1 and 2 share the exact journey a,b,c,d (identical trigram
    // sets); user 3 shares only a suffix; user 4 is disjoint and must
    // never be scored (inverted-index pruning)
    def journey(u: Long, types: Seq[String], base: Long) =
      types.zipWithIndex.map { case (t, i) =>
        (u, t, ts(s"2024-01-01 10:00:0$i"), base + i)
      }
    val ev = (journey(1L, Seq("a", "b", "c", "d"), 10L) ++
      journey(2L, Seq("a", "b", "c", "d"), 20L) ++
      journey(3L, Seq("x", "b", "c", "d"), 30L) ++
      journey(4L, Seq("p", "q", "r", "s"), 40L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.trajectoryTopK(ev, $"user_id" === 1, k = 5)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getDouble(4), r.getLong(5)))
    // identical journey: jacc 1.0 at rank 1; suffix-sharer second;
    // disjoint user absent
    assert(out.map(_._1).toSeq === Seq(2L, 3L))
    assert(out.head._2 === 1.0)
    assert(out(1)._2 === (1.0 / 3.0))
  }

  test("volumeAnomalies: planted spike flags, zero-variance flags any change") {
    import spark.implicits._
    // 14 flat hours at 5 events, then hour 14 spikes to 50: trailing
    // stats are zero-variance (all 5s) → bound = 0, dev2 > 0 → flagged.
    // Hour 13 (still 5 events, 13 trailing samples) must NOT flag.
    // Hours 0-11 have <12 trailing samples → false with zeroed terms.
    val ev = (0 until 15).flatMap { hr =>
      val cnt = if (hr == 14) 50 else 5
      (0 until cnt).map(i =>
        (hr * 100L + i, ts(f"2024-01-01 $hr%02d:30:00"), 1L, "click"))
    }.toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.volumeAnomalies(ev).collect()
      .map(r => (r.getString(1).substring(11, 13).toInt,
        r.getLong(2), r.getLong(3), r.getBoolean(6))).sortBy(_._1)
    assert(out.count(_._4) === 1)
    assert(out.find(_._1 == 14).get._4 === true)   // the spike
    assert(out.find(_._1 == 13).get._4 === false)  // flat hour: no flag
    assert(out.filter(_._1 < 12).forall(!_._4))    // no baseline yet
  }

  test("linearAttribution: largest-remainder split, conservation, window cut") {
    // conversion 100 (user 1) has THREE touches inside the hour:
    // 100 DIV 3 = 33 each, remainder 1 to the EARLIEST (the view at
    // 10:00) → view 34, clicks 33+33. A click 61 minutes before is
    // outside the lookback; an untouched purchase (user 2) gets no row.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:20:00"), 2L),
      (1L, "click", ts("2024-01-01 10:40:00"), 3L),
      (1L, "click", ts("2024-01-01 09:59:00"), 4L), // 61 min before: out
      (1L, "purchase", ts("2024-01-01 11:00:00"), 100L),
      (2L, "purchase", ts("2024-01-01 11:00:00"), 101L)
    ).map { case (u, t, time, id) => (id, time, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics
      .linearAttribution(ev, touchTypes = Seq("click", "view"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out === Seq(("click", 2L, 66L, 1L), ("view", 1L, 34L, 1L)))
    // conservation: exactly 100 units per touched conversion
    assert(out.map(_._3).sum === 100L)
  }

  test("cupedReadout: hand-computed theta and adjusted means") {
    // hash split (u·104729 % 100 < 50): u1→29 A, u4→16 A, u2→58 B, u3→87 B
    // per-user (x = pre count, y = post purchases):
    //   u1 (x=2,y=3)  u4 (x=4,y=5)  u2 (x=1,y=1)  u3 (x=3,y=3)
    def rows(u: Long, x: Int, y: Int) =
      (1 to x).map(i => (u, "view", ts(s"2024-01-0$i 01:00:00"))) ++
        (1 to y).map(i => (u, "purchase", ts(s"2024-01-2$i 01:00:00")))
    val ev = (rows(1L, 2, 3) ++ rows(4L, 4, 5) ++ rows(2L, 1, 1) ++
      rows(3L, 3, 3)).toDF("user_id", "event_type", "ts")
    val out = EventAnalytics
      .cupedReadout(ev, cutoverTs = "2024-01-16 00:00:00").collect()
    // moments: n=4, Sx=10, Sy=12, Sxx=30, Sxy=36
    // θ_num = 4·36 − 10·12 = 24; θ_den = 4·30 − 100 = 20 (θ = 1.2)
    val (tn, td) = (24.0, 20.0)
    val a = out(0)
    assert(a.getString(0) === "A" && a.getLong(1) === 2L)
    assert((a.getLong(2), a.getLong(3), a.getLong(4), a.getLong(5)) ===
      ((8L, 6L, 24L, 20L)))
    // A: ȳ=4, x̄=3, x̄_all=2.5 → adj = 4 − 1.2·0.5 = 3.4
    assert(a.getDouble(7) === 8.0 / 2 - (tn / td) * (6.0 / 2 - 10.0 / 4))
    val b = out(1)
    // B: ȳ=2, x̄=2 → adj = 2 − 1.2·(−0.5) = 2.6
    assert(b.getString(0) === "B")
    assert(b.getDouble(7) === 4.0 / 2 - (tn / td) * (4.0 / 2 - 10.0 / 4))
    // the covariate really reduced the gap: |adjA−adjB| < |meanA−meanB|
    assert(math.abs(a.getDouble(7) - b.getDouble(7))
      < math.abs(a.getDouble(6) - b.getDouble(6)))
  }

  test("episodeSupport counts interleaved before-pairs once per user") {
    val ev = Seq(
      // user 1: a .. b .. a — (a,b) yes; (b,a) yes (b@11 before a@12)
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "b", ts("2024-01-01 11:00:00"), 2L),
      (1L, "a", ts("2024-01-01 12:00:00"), 3L),
      // user 2: b then a only — (b,a) yes, (a,b) no
      (2L, "b", ts("2024-01-01 10:00:00"), 4L),
      (2L, "a", ts("2024-01-01 11:00:00"), 5L),
      // user 3: a only — contributes nothing
      (3L, "a", ts("2024-01-01 10:00:00"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.episodeSupport(ev, "user_id", "event_type",
        EventAnalytics.eventKey($"ts", $"event_id"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      ("a", "b") -> ((1L, 1.0 / 3.0)),
      ("b", "a") -> ((2L, 2.0 / 3.0))))
  }

  test("seasonalBaselineError: calendar lags skip grid gaps exactly") {
    // hourly counts for series x: h0=2, h1=1, h2=3, h25=2, h26=3
    // naive pairs (1h): (h0,h1)=1, (h1,h2)=2, (h25,h26)=1 -> n=3, sae=4
    // seasonal pairs (24h): (h1,h25)=1, (h2,h26)=0 -> n=2, sae=1
    val ev = Seq(
      "2024-01-01 00:10:00", "2024-01-01 00:20:00",
      "2024-01-01 01:15:00",
      "2024-01-01 02:05:00", "2024-01-01 02:10:00", "2024-01-01 02:30:00",
      "2024-01-02 01:05:00", "2024-01-02 01:10:00",
      "2024-01-02 02:01:00", "2024-01-02 02:02:00", "2024-01-02 02:03:00"
    ).map(s => ("x", ts(s))).toDF("event_type", "ts")
    val r = EventAnalytics.seasonalBaselineError(ev, "event_type", "ts")
      .collect()
    assert(r.length === 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getLong(3),
      r.head.getLong(4), r.head.getDouble(5)) === ((3L, 4L, 2L, 1L, 0.25)))
  }

  test("cusumChangepoint accumulates a persistent shift to an exact alarm") {
    // hourly counts 1,1,1,10,10: tot=23, n=5, k=ceil(23/5)=5
    // S = 0,0,0,5,10; max=10; alarm at 5k=25 never (hFactor=5),
    // at 2k=10 on hour 5 (hFactor=2)
    val ev = (Seq.fill(1)("00") ++ Seq.fill(1)("01") ++ Seq.fill(1)("02"))
      .zipWithIndex.map { case (h, i) => ("x", ts(s"2024-01-01 $h:0$i:00")) } ++
      (0 until 10).map(i => ("x", ts(f"2024-01-01 03:$i%02d:00"))) ++
      (0 until 10).map(i => ("x", ts(f"2024-01-01 04:$i%02d:00")))
    val df = ev.toDF("event_type", "ts")
    val r5 = EventAnalytics.cusumChangepoint(df, "event_type", "ts").collect()(0)
    assert((r5.getLong(1), r5.getLong(2), r5.getLong(3), r5.getLong(4))
      === ((5L, 5L, 10L, 0L)))
    val r2 = EventAnalytics.cusumChangepoint(df, "event_type", "ts",
      hFactor = 2L).collect()(0)
    assert(r2.getLong(4) === 5L, "alarm on the 5th hour at threshold 2k")
  }

  test("rfmSegments scores exact terciles with inverted recency") {
    // anchor = Jan 10. A: last Jan 3 (r=7), f=2, m=30000c
    //                 B: last Jan 10 (r=0), f=1, m=5000c
    //                 C: last Jan 6 (r=4), f=2, m=3000c
    // terciles (n=3): t1 = 1st, t2 = 2nd order stat
    val tx = Seq(
      ("A", ts("2024-01-01 12:00:00"), 100.0),
      ("A", ts("2024-01-03 12:00:00"), 200.0),
      ("B", ts("2024-01-10 12:00:00"), 50.0),
      ("C", ts("2024-01-02 12:00:00"), 10.0),
      ("C", ts("2024-01-06 12:00:00"), 20.0)
    ).toDF("cust", "ts", "price")
    val out = EventAnalytics.rfmSegments(tx, "cust", "ts",
        (col("price").cast("decimal(18,2)") * 100).cast("bigint"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7)))).toMap
    assert(out === Map(
      "A" -> ((7L, 2L, 30000L, 123L)),
      "B" -> ((0L, 1L, 5000L, 312L)),
      "C" -> ((4L, 2L, 3000L, 221L))))
  }

  test("twoProportionGate: exact integer z² verdict, denom-filtered") {
    // cohort 0 (even users): 4 clickers, all purchase; cohort 1: 4
    // clickers, none purchase. z² = 8 > 4 -> significant. User 9
    // purchases WITHOUT clicking -> excluded from n2 entirely.
    def ev(u: Long, t: String, i: Long) = (u, t, ts("2024-01-01 10:00:00"), i)
    val rows = (0L to 7L).map(u => ev(u, "click", u)) ++
      Seq(0L, 2L, 4L, 6L).map(u => ev(u, "purchase", 10 + u)) :+
      ev(9L, "purchase", 99L)
    val df = rows.toDF("user_id", "event_type", "ts", "event_id")
    val r = EventAnalytics.twoProportionGate(
      df, "user_id", "event_type", "click", "purchase").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((4L, 4L, 4L, 0L)))
    assert((r.getDouble(4), r.getDouble(5)) === ((1.0, 0.0)))
    assert(r.getBoolean(6), "z^2 = 8 > 4 must be significant")
    // balanced outcome -> diff = 0 -> not significant
    val bal = rows.filter(_._2 == "click") ++
      Seq(0L, 2L).map(u => ev(u, "purchase", 20 + u)) ++
      Seq(1L, 3L).map(u => ev(u, "purchase", 30 + u))
    val r2 = EventAnalytics.twoProportionGate(
      bal.toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "click", "purchase").collect()(0)
    assert(!r2.getBoolean(6))
  }

  test("topPaths folds the first-k steps in key order with exact cohorts") {
    def ev(u: Long, t: String, i: Long) = (u, t, ts("2024-01-01 10:00:00"), i)
    val rows = Seq(
      ev(1, "a", 1), ev(1, "b", 2), ev(1, "c", 3), ev(1, "d", 4), // a>b>c
      ev(2, "a", 5), ev(2, "b", 6), ev(2, "c", 7),                // a>b>c
      ev(3, "a", 8), ev(3, "b", 9),                               // a>b
      ev(4, "x", 10))                                             // x
    val out = EventAnalytics.topPaths(
        rows.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type",
        EventAnalytics.eventKey($"ts", $"event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a>b>c", 3L, 2L), ("a>b", 2L, 1L), ("x", 1L, 1L)))
  }

  test("episodeSupport: same-key tie is NOT 'before' (strict order)") {
    // one user, two types in the same second with ordered event ids:
    // only the id order decides — (x,y) holds, (y,x) does not
    val ev = Seq(
      (1L, "x", ts("2024-01-01 10:00:00"), 1L),
      (1L, "y", ts("2024-01-01 10:00:00"), 2L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = EventAnalytics.episodeSupport(ev, "user_id", "event_type",
        EventAnalytics.eventKey($"ts", $"event_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("x", "y")))
  }

  test("interArrivalHistogram: bin-length buckets, zero-gap bucket 0") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:00:00"), 2L), // same second -> gap 0
      (1L, ts("2024-01-01 10:00:05"), 3L), // gap 5 -> bin '101' -> bucket 3
      (1L, ts("2024-01-01 10:00:06"), 4L), // gap 1 -> bucket 1
      (2L, ts("2024-01-01 10:00:00"), 5L),
      (2L, ts("2024-01-01 10:17:04"), 6L)  // gap 1024 -> bucket 11
    ).toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.interArrivalHistogram(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 1L, 0L, 0L), (1L, 1L, 1L, 1L),
      (3L, 1L, 5L, 5L), (11L, 1L, 1024L, 1024L)))
  }

  test("markovStationary: exact floor-arithmetic power iteration") {
    val ev = Seq(
      // user 1: a,a,b -> (a,a),(a,b); user 2: b,a -> (b,a)
      (1L, "a", ts("2024-01-01 10:00:00"), 1L),
      (1L, "a", ts("2024-01-01 10:01:00"), 2L),
      (1L, "b", ts("2024-01-01 10:02:00"), 3L),
      (2L, "b", ts("2024-01-01 10:00:00"), 4L),
      (2L, "a", ts("2024-01-01 10:01:00"), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    // c: (a,a)=1,(a,b)=1,(b,a)=1; rowsums a=2, b=1; pi0 = 500000 each
    // r1: a=250000+500000, b=250000; r2: a=625000, b=375000;
    // r3: a=312500+375000=687500, b=312500 (converging to 2/3, 1/3)
    val out = EventAnalytics.markovStationary(ev, "user_id", "event_type",
      EventAnalytics.eventKey($"ts", $"event_id"), iters = 3,
      scale = 1000000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 687500L, 0.6875), ("b", 312500L, 0.3125)))
  }

  test("olsTrend recovers an exact linear ramp (slope 2, intercept 3, r2 1)") {
    // days 0..4 with volumes 3,5,7,9,11: y = 2x + 3 exactly.
    val ev = (0 to 4).flatMap { d =>
      (1 to (3 + 2 * d)).map(i =>
        (d.toLong * 100 + i, ts(f"2024-01-${d + 1}%02d 10:00:00")))
    }.toDF("event_id", "ts")
    val r = EventAnalytics.olsTrend(ev).collect()(0)
    assert(r.getLong(0) === 5L)
    assert(r.getDouble(1) === 2.0)
    assert(r.getDouble(2) === 3.0)
    assert(r.getDouble(3) === 1.0)
  }

  test("maxBurst counts the densest value-defined window, not adjacency") {
    val ev = Seq(
      // user 1: 3 events inside 10s (t=0,4,9), a 4th at t=30
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:00:04")),
      (1L, ts("2024-01-01 00:00:09")), (1L, ts("2024-01-01 00:00:30")),
      // user 2: two events 10s apart -> window [t-9, t] never holds both
      (2L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:00:10"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.maxBurst(ev, windowSec = 10, threshold = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq((1L, 4L, 3L, true), (2L, 2L, 1L, false)))
  }

  test("churnHazard: at-risk nests by age, last-day users are censored") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")), // age 1, churned
      (2L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-04 10:00:00")), // age 3, censored (gmax)
      (3L, ts("2024-01-03 10:00:00"))                                   // age 0, churned
    ).toDF("user_id", "ts")
    val out = EventAnalytics.churnHazard(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 3L, 1L, 0L, 1.0 / 3.0),
      (1L, 2L, 1L, 0L, 0.5),
      (3L, 1L, 0L, 1L, 0.0)))
  }

  test("kaplanMeier: hand-computed product-limit curve with censoring") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")), // age 2, death
      (2L, ts("2024-01-01 11:00:00")), (2L, ts("2024-01-03 09:00:00")), // age 2, death
      (3L, ts("2024-01-01 10:00:00")), (3L, ts("2024-01-06 10:00:00")), // age 5, death
      (4L, ts("2024-01-04 10:00:00")), (4L, ts("2024-01-11 10:00:00")), // age 7, censored (gmax)
      (5L, ts("2024-01-11 09:00:00")) // age 0, censored (gmax day)
    ).toDF("user_id", "ts")
    val out = EventAnalytics.kaplanMeier(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // S(0) = 1·(1−0/5); S(2) = ·(1−2/4); S(5) = ·(1−1/2); S(7) = ·(1−0/1)
    assert(out.toSeq === Seq(
      (0L, 5L, 0L, 1L, 1.0),
      (2L, 4L, 2L, 0L, 0.5),
      (5L, 2L, 1L, 0L, 0.25),
      (7L, 1L, 0L, 1L, 0.25)))
  }

  test("hourlyAutocorrelation: exact 1.0 at the planted period") {
    // counts perfectly periodic with period 24 (c = 1 + hour-of-day):
    // every aligned pair at lag 24 has x == y, so the sample ACF is
    // EXACTLY 1.0 (vx == vy == num and sqrt(v**2) == |v| for doubles
    // this small); lag 12 pairs anti-phase halves and must come out
    // strictly below 1.
    val ev = (0 until 24 * 10).flatMap { h =>
      Seq.fill(1 + h % 24)(h.toLong)
    }.toDF("h").select(timestamp_seconds($"h" * 3600L + 30L).as("ts"))
    val acf = EventAnalytics.hourlyAutocorrelation(ev, lags = Seq(12, 24))
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(acf(24L) === 1.0, s"periodic series must autocorrelate exactly: $acf")
    assert(acf(12L) < 0.0, s"anti-phase lag should be negative: $acf")
    // degenerate: constant series has zero variance -> NULL, not a throw
    val const = (0 until 48).map(_.toLong).toDF("h")
      .select(timestamp_seconds($"h" * 3600L).as("ts"))
    val row = EventAnalytics.hourlyAutocorrelation(const, lags = Seq(24))
      .collect().head
    assert(row.isNullAt(5), s"zero-variance acf must be NULL: $row")
  }
}
