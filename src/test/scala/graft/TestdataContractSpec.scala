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

  test("eventsContractSchema matches the real files (fallback cannot drift)") {
    assert(raw("events").schema == Tables.eventsContractSchema,
      "testdata schema changed: events no longer matches " +
        "Tables.eventsContractSchema — update BOTH (the streaming " +
        "empty-dir fallback reads the pinned copy)")
  }

  test("events.props rows all parse as JSON with an integral k (q152 contract)") {
    // q152's engines diverge asymmetrically at the edges: Spark
    // from_json NULLs a malformed payload or non-integral k, while
    // DuckDB props->>'$.k' + CAST errors. The gate only stays
    // symmetric while EVERY row parses and k is an unquoted integer —
    // pin exactly that, so a props regen fails here with a name, not in
    // the oracle with a hash mismatch.
    import org.apache.spark.sql.functions._
    val ev = raw("events")
    val n = ev.count()
    val ok = ev
      .select(from_json(col("props"),
        StructType(Seq(StructField("k", LongType))))
        .getField("k").as("k"), col("props"))
      .filter(col("k").isNotNull &&
        col("props").rlike("\"k\"\\s*:\\s*-?\\d+\\s*[,}]"))
      .count()
    assert(ok == n,
      s"testdata contract changed: events.props — only $ok/$n rows carry " +
        "valid JSON with an unquoted integral k; q152's oracle would now " +
        "diverge (Spark nulls, DuckDB errors)")
  }

  test("cdc staged chunks preserve the raw events contract (stream-side canary)") {
    val dir = graft.streaming.EventPipeline.cdcChunksDir(spark, sf0001)
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 3, s"expected 3 staged cdc chunks, found ${files.length}")
    val rawEv = raw("events")
    files.foreach { f =>
      assert(spark.read.parquet(f.toString).schema == rawEv.schema,
        s"testdata schema changed: staged cdc chunk ${f.getName} drifted " +
          s"from the raw events schema")
    }
    // chunks are LSN-range partitioned in file order (the property the
    // cumulative upsert's batch equivalence rests on) and lossless
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.toString)
        .selectExpr("min(event_id)", "max(event_id)", "count(*)").head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    ranges.toSeq.sliding(2).foreach {
      case Seq((_, hiA, _), (loB, _, _)) =>
        assert(hiA < loB, s"cdc chunks overlap: max $hiA >= next min $loB")
      case _ =>
    }
    assert(ranges.map(_._3).sum == rawEv.count(),
      "staged cdc chunks dropped or duplicated events rows")
  }
}
