package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two documented domain-bounded contracts (q96's mix-capped global
  * pack window; q191/q213's calendar-bounded age support) must fail
  * LOUDLY when violated, not rest on comments (VERDICT r11 directive
  * #7). Each test here drives the actual violating shape through the
  * guard and asserts the failure names the contract; the happy paths
  * are covered by the oracle gate (q96/q191/q213 all hash-match), so
  * these specs only need the failure legs plus one pass-through check
  * that the guard leaves legal values untouched.
  */
class ContractGuardSpec extends SparkSpec {

  private def rootCause(t: Throwable): String = {
    var c: Throwable = t
    while (c.getCause != null && (c.getCause ne c)) c = c.getCause
    Option(c.getMessage).getOrElse("") + " " + c.getClass.getName
  }

  test("packMixedGlobal throws (naming the contract) past the mix cap") {
    import spark.implicits._
    val big = spark.range(500)
      .select(col("id").as("doc_id"), lit(10L).as("n_tokens"),
        md5(col("id").cast("string")).as("skey"))
    val ex = intercept[Throwable] {
      graft.queries.PipelineQueries.packMixedGlobal(big, maxRows = 100L)
        .collect()
    }
    assert(rootCause(ex).contains("packMixedGlobal contract"),
      s"guard fired but without the contract name: ${rootCause(ex)}")
    // pass-through: a legal input bins identically with the guard woven in
    val small = big.limit(7)
    val got = graft.queries.PipelineQueries.packMixedGlobal(small, maxRows = 100L)
      .select(col("bin")).as[Long].collect().toSeq
    // 7 docs x 10 tokens, 2048/bin: every prefix sum < 2048 -> all bin 0
    assert(got === Seq.fill(7)(0L))
  }

  test("churnHazard throws (naming the contract) on non-day-grain ages") {
    import spark.implicits._
    // ages spread over ~55,000 days (0 to 150 years): violates the
    // calendar-bound default and is exactly what a seconds-grain or
    // mis-parsed timestamp diff looks like
    val ev = Seq(
      ("u1", "1900-01-01"), ("u1", "2055-01-01"),
      ("u2", "2000-01-01"), ("u2", "2000-01-02")
    ).toDF("user_id", "d").select(col("user_id"), to_timestamp(col("d")).as("ts"))
    val ex = intercept[Throwable] {
      EventAnalytics.churnHazard(ev).collect()
    }
    assert(rootCause(ex).contains("churnHazard contract"),
      s"guard fired but without the contract name: ${rootCause(ex)}")
    // same data passes when the caller raises the horizon explicitly,
    // and the life table is unchanged by the guard column
    val ok = EventAnalytics.churnHazard(ev, maxAgeDays = 100000L)
      .select(col("age"), col("at_risk"), col("deaths")).collect()
    assert(ok.length === 2)
    // kaplanMeier rides the same guard (it builds on churnHazard)
    val ex2 = intercept[Throwable] {
      EventAnalytics.kaplanMeier(ev).collect()
    }
    assert(rootCause(ex2).contains("churnHazard contract"))
  }
}
