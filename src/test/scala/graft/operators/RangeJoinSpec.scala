package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:10:00"), 7L),
    (2L, ts("2024-01-01 12:00:00"), 8L)
  ).toDF("event_id", "ts", "user_id")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 10:05:00"), 7L), // inside 5-min lookback of 1
    (11L, ts("2024-01-01 10:05:00"), 8L), // right time, wrong key
    (12L, ts("2024-01-01 10:04:59"), 7L), // 1s outside the lookback
    (13L, ts("2024-01-01 10:10:00"), 7L), // boundary: equal ts matches
    (14L, ts("2024-01-01 11:59:00"), 8L)  // matches 2
  ).toDF("event_id", "ts", "user_id")

  test("interval join keeps exactly the in-window, key-matched pairs") {
    val out = RangeJoin.intervalJoin(left, right, "ts", 300, Seq("user_id"))
      .select($"l_event_id", $"r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (1L, 13L), (2L, 14L)))
  }

  test("boundary: a right row exactly lookback seconds earlier matches") {
    val r2 = Seq((20L, ts("2024-01-01 10:05:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val out = RangeJoin.intervalJoin(left, r2, "ts", 300, Seq("user_id"))
      .select($"l_event_id", $"r_event_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 20L)))
  }

  test("keyless variant equals the naive range filter on real events") {
    val ev = graft.Tables.load(spark, sf0001, "events")
    val p = ev.filter($"event_type" === "purchase").limit(50)
    val c = ev.filter($"event_type" === "click")
    val binned = RangeJoin.intervalJoin(p, c, "ts", 3600)
      .select($"l_event_id", $"r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = p.select($"event_id".as("p_id"), $"ts".as("p_ts"))
      .crossJoin(c.select($"event_id".as("c_id"), $"ts".as("c_ts")))
      .filter($"c_ts" >= $"p_ts" - expr("INTERVAL 3600 SECOND") &&
        $"c_ts" <= $"p_ts")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("overlapJoin: closed-interval touch counts, multi-bin dedups once") {
    val L = Seq((1L, 0L, 10L), (2L, 95L, 105L)).toDF("id", "s", "e")
    val R = Seq(("a", 10L, 20L), ("b", 30L, 40L), ("c", 0L, 200L))
      .toDF("rid", "s", "e")
    val out = RangeJoin.overlapJoin(L, R, "s", "e", binSize = 10L)
      .collect().map(r => (r.getAs[Long]("l_id"), r.getAs[String]("r_rid")))
    // (1,a): touch at point 10 (closed); (1,c),(2,c): c spans 21 bins ->
    // each pair must appear EXACTLY once despite many shared bins
    assert(out.toSeq.sorted === Seq((1L, "a"), (1L, "c"), (2L, "c")))
  }

  test("overlapJoin equals the naive cross-join on a seeded interval set") {
    val mk = (n: Int, seed: Int) => (0 until n).map { i =>
      val s = ((i * 7919 + seed * 104729) % 500).toLong
      (i.toLong, s, s + (i % 37).toLong)
    }
    val L = mk(60, 1).toDF("id", "s", "e")
    val R = mk(80, 2).toDF("id", "s", "e")
    val fast = RangeJoin.overlapJoin(L, R, "s", "e", binSize = 25L)
      .select($"l_id", $"r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = L.select($"id".as("a"), $"s".as("as_"), $"e".as("ae"))
      .crossJoin(R.select($"id".as("b"), $"s".as("bs"), $"e".as("be")))
      .filter($"as_" <= $"be" && $"bs" <= $"ae")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }
}
