package graft.operators

import graft.SparkSpec

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val names = Seq(
    (1L, "alpha beta"),
    (2L, "alpha bets"),   // dist 1 from 1
    (3L, "alpha betas"),  // dist 1 from 2, dist 2 from... wait: vs 1 = 1 insert
    (4L, "zzzz qqqq"),    // unrelated
    (5L, "ab")            // shorter than q: no grams, never a candidate
  ).toDF("id", "name")

  test("editDistanceJoin finds near pairs and verifies exact distances") {
    val out = StringSim.editDistanceJoin(names, "id", "name",
      maxDist = 2, q = 3, maxDf = 20)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) === 1L)
    assert(out.contains((1L, 3L)) && out((1L, 3L)) === 1L)
    assert(out.contains((2L, 3L)))
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
    assert(!out.keys.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("editDistanceJoin df cap drops candidates whose only shared grams are common") {
    // every name shares the hot gram; with maxDf 1 no gram survives
    val hot = Seq((1L, "xxab"), (2L, "xxac"), (3L, "xxad"))
      .toDF("id", "name")
    val out = StringSim.editDistanceJoin(hot, "id", "name",
      maxDist = 2, q = 3, maxDf = 1)
    assert(out.count() === 0) // documented precision/recall knob
  }

  test("editDistanceJoin respects the length filter") {
    val df = Seq((1L, "abcdef"), (2L, "abcdefghij")).toDF("id", "name")
    // shares grams, but lengths differ by 4 > maxDist 2 -> pruned before
    // the verify stage ever runs
    val out = StringSim.editDistanceJoin(df, "id", "name",
      maxDist = 2, q = 3, maxDf = 20)
    assert(out.count() === 0)
  }
}
