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
}
