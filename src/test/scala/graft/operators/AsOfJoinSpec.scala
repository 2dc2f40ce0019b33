package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:07:00"), 200.0)
  ).toDF("user_id", "ts", "price")

  private lazy val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:06:00")), // → quote 101.0
    (11L, 1L, ts("2024-01-01 10:05:00")), // equal ts → inclusive, 101.0
    (12L, 1L, ts("2024-01-01 09:59:00")), // before any quote → null
    (13L, 2L, ts("2024-01-01 11:00:00")), // → 200.0
    (14L, 3L, ts("2024-01-01 10:00:00"))  // key with no quotes → null
  ).toDF("trade_id", "user_id", "ts")

  test("asOfLeft picks the latest right row at or before each left ts") {
    val out = AsOfJoin.asOfLeft(trades, quotes, "user_id", "ts", "ts",
      Seq("price" -> "quote_price"))
      .select($"trade_id", $"quote_price")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(10L) === Some(101.0))
    assert(out(11L) === Some(101.0)) // inclusive equal-ts
    assert(out(12L) === None)
    assert(out(13L) === Some(200.0))
    assert(out(14L) === None)
  }

  test("asOfForward picks the earliest right row at or after; tolerance nulls") {
    val out = AsOfJoin.asOfForward(trades, quotes, "user_id", "ts", "ts",
      Seq("price" -> "next_price"), toleranceSec = Some(300L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      10L -> Some(102.0), // next quote 10:10, 240 s ahead, inside 300 s
      11L -> Some(101.0), // equal ts -> inclusive
      12L -> Some(100.0), // next quote 10:00, 60 s ahead
      13L -> None,        // no quote after 11:00
      14L -> None))       // key with no quotes
  }

  test("asOfForward rightTie picks the smallest tie among equal-ts rights") {
    val q2 = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 700.0),
      (1L, ts("2024-01-01 10:00:00"), 3L, 300.0) // same ts, smaller id
    ).toDF("user_id", "ts", "quote_id", "price")
    val t2 = Seq((10L, 1L, ts("2024-01-01 09:00:00")))
      .toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.asOfForward(t2, q2, "user_id", "ts", "ts",
      Seq("price" -> "next_price"), rightTie = Some("quote_id"))
      .collect()(0)
    assert(out.getDouble(3) === 300.0)
  }

  test("asOfForward without tolerance keeps any following match") {
    val out = AsOfJoin.asOfForward(trades, quotes, "user_id", "ts", "ts",
      Seq("price" -> "next_price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(10L) === Some(102.0) && out(12L) === Some(100.0))
    assert(out(13L) === None && out(14L) === None)
  }

  test("asOfForward takes ALL values (and the tolerance ts) from the ONE nearest row") {
    // nearest following right row carries a NULL value: per-column fills
    // would pull the value from the LATER row (10:20 — beyond the 300 s
    // tolerance measured against the nearest row's 10:01 timestamp) and
    // mix columns across rows; the struct fill must keep the nearest
    // row's null AND its timestamp
    val q = Seq(
      (1L, ts("2024-01-01 10:01:00"), Option.empty[Double], Some(5L)),
      (1L, ts("2024-01-01 10:20:00"), Some(999.0), Option.empty[Long])
    ).toDF("user_id", "ts", "price", "qty")
    val t = Seq((10L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("trade_id", "user_id", "ts")
    val out = AsOfJoin.asOfForward(t, q, "user_id", "ts", "ts",
      Seq("price" -> "p", "qty" -> "q"), toleranceSec = Some(300L))
      .select($"trade_id", $"p", $"q").collect()(0)
    assert(out.isNullAt(1), "price must be the nearest row's NULL, not 999.0")
    assert(!out.isNullAt(2) && out.getLong(2) === 5L,
      "qty must come from the same (nearest) row")
  }

  test("asOfLeft preserves every left row exactly once") {
    val out = AsOfJoin.asOfLeft(trades, quotes, "user_id", "ts", "ts",
      Seq("price" -> "quote_price"))
    assert(out.count() === trades.count())
    assert(out.select("trade_id").distinct().count() === trades.count())
  }
}

class SkewSpec extends SparkSpec {

  private lazy val li = graft.Tables.load(spark, sf0001, "lineitem")
  private lazy val sup = graft.Tables.load(spark, sf0001, "supplier")

  test("saltedSum equals the naive aggregation exactly") {
    val salted = Skew.saltedSum(li, Seq("l_suppkey"),
      col("l_extendedprice").cast("decimal(18,2)"), "total",
      saltExpr = xxhash64(col("l_orderkey"), col("l_linenumber")))
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    val naive = li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("total"))
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(salted === naive)
  }

  test("saltedJoin row set equals the naive join") {
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", "s_suppkey",
      saltExpr = xxhash64(col("l_orderkey"), col("l_linenumber")))
      .select("l_orderkey", "l_linenumber", "s_name")
      .collect().map(_.toSeq).toSet
    val naive = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_name")
      .collect().map(_.toSeq).toSet
    assert(salted === naive)
  }
}
