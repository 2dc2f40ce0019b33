package graft

import org.apache.spark.sql.types._

/** Testdata-contract canary. The driver regenerates /root/testdata between
  * rounds, and a silent physical-type change there is the single most
  * expensive failure mode this repo has hit (round 7: events.ts moved from
  * TIMESTAMP(NANOS)-as-int64 to timestamp[us] → 4 silently-wrong streaming
  * answers, 31 vanished gate entries, 23 test failures). This spec pins the
  * CURRENT raw schema of every table; when the contract drifts again it
  * fails with a one-line "testdata schema changed: table.col" message,
  * turning the next regen into a ten-minute fix instead of a lost round.
  */
class TestdataContractSpec extends SparkSpec {

  private def raw(name: String) = {
    // match the loaders' read conf: inert on µs data, and keeps a legacy
    // nanos boot readable instead of hard-failing before the check runs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf0001/$name.parquet")
  }

  private def assertSchema(name: String, expected: Seq[(String, DataType)]): Unit = {
    val actual = raw(name).schema.map(f => f.name -> f.dataType)
    expected.zipWithIndex.foreach { case ((col, dt), i) =>
      assert(i < actual.length && actual(i)._1 == col,
        s"testdata schema changed: $name missing/moved column '$col' " +
          s"(found ${actual.map(_._1).mkString(", ")})")
      assert(actual(i)._2 == dt,
        s"testdata schema changed: $name.$col is ${actual(i)._2}, expected $dt")
    }
    assert(actual.length == expected.length,
      s"testdata schema changed: $name has extra columns " +
        actual.drop(expected.length).map(_._1).mkString(", "))
  }

  test("region raw schema is pinned") {
    assertSchema("region", Seq(
      "r_regionkey" -> IntegerType,
      "r_name" -> StringType))
  }

  test("nation raw schema is pinned") {
    assertSchema("nation", Seq(
      "n_nationkey" -> IntegerType,
      "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
  }

  test("customer raw schema is pinned") {
    assertSchema("customer", Seq(
      "c_custkey" -> LongType,
      "c_name" -> StringType,
      "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
  }

  test("supplier raw schema is pinned") {
    assertSchema("supplier", Seq(
      "s_suppkey" -> LongType,
      "s_name" -> StringType,
      "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
  }

  test("part raw schema is pinned") {
    assertSchema("part", Seq(
      "p_partkey" -> LongType,
      "p_name" -> StringType,
      "p_brand" -> StringType,
      "p_type" -> StringType,
      "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
  }

  test("orders raw schema is pinned") {
    assertSchema("orders", Seq(
      "o_orderkey" -> LongType,
      "o_custkey" -> LongType,
      "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
  }

  test("lineitem raw schema is pinned") {
    assertSchema("lineitem", Seq(
      "l_orderkey" -> LongType,
      "l_partkey" -> LongType,
      "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType,
      "l_tax" -> DoubleType,
      "l_returnflag" -> StringType,
      "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("events raw schema is the µs-native contract (ts: TIMESTAMP_NTZ)") {
    assertSchema("events", Seq(
      "event_id" -> LongType,
      "ts" -> TimestampNTZType, // timestamp[us], naive — the round-8 contract
      "user_id" -> LongType,
      "event_type" -> StringType,
      "value" -> DoubleType,
      "props" -> StringType))
  }

  test("documents raw schema is pinned") {
    assertSchema("documents", Seq(
      "doc_id" -> LongType,
      "text" -> StringType,
      "lang" -> StringType,
      "source" -> StringType,
      "n_chars" -> LongType))
  }

  test("embeddings raw schema is pinned") {
    assertSchema("embeddings", Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("Tables.load normalizes events.ts to session-TZ TIMESTAMP") {
    val ev = Tables.load(spark, sf0001, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"Tables.load(events).ts is ${ev.schema("ts").dataType}, expected TIMESTAMP")
    // micros survive the NTZ→LTZ cast exactly under the UTC session TZ
    val r = raw("events")
      .selectExpr("min(CAST(ts AS TIMESTAMP))", "max(CAST(ts AS TIMESTAMP))").head()
    val n = ev.selectExpr("min(ts)", "max(ts)").head()
    assert(n.getTimestamp(0) == r.getTimestamp(0) &&
      n.getTimestamp(1) == r.getTimestamp(1),
      "normalizeTs changed the events time range")
  }

  test("normalizeTs rejects an unrecognized ts type loudly") {
    val bad = spark.range(1).selectExpr("CAST(id AS STRING) AS ts")
    val e = intercept[RuntimeException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("testdata schema changed"))
  }
}
