package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMinValuesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate is exact below the sketch size") {
    val df = (1 to 100).toDF("v")
    val est = df.agg(KMinValues($"v", 256).as("e")).head.getDouble(0)
    assert(est === 100.0)
  }

  test("KMV estimate within 15% on lineitem part keys") {
    val li = graft.Tables.load(spark, sf001, "lineitem")
    val exact = li.agg(countDistinct($"l_partkey")).head.getLong(0).toDouble
    val est = li.agg(KMinValues($"l_partkey", 256).as("e")).head.getDouble(0)
    assert(math.abs(est - exact) / exact < 0.15,
      s"estimate $est vs exact $exact")
  }

  test("KMV is deterministic across runs and partitionings") {
    val li = graft.Tables.load(spark, sf001, "lineitem")
    val e1 = li.agg(KMinValues($"l_partkey", 128)).head.getDouble(0)
    val e2 = li.repartition(13).agg(KMinValues($"l_partkey", 128)).head.getDouble(0)
    assert(e1 === e2) // merge-order independence: bottom-k union is commutative
  }

  test("regression: NULLs contribute nothing, matching COUNT(DISTINCT)") {
    val df = (1 to 10).map(i => (i, if (i % 2 == 0) null else s"v${i % 3}"))
      .toDF("id", "s")
    val got = df.agg(
      countDistinct($"s").as("exact"),
      KMinValues($"s", 64).as("est")).head
    assert(got.getDouble(1) === got.getLong(0).toDouble) // exact below k
  }

  test("regression: SQL kmv_distinct(col, k) honors the k argument") {
    // inject the extension functions into the shared session's registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct",
      exprs => exprs match {
        case Seq(e) => KMinValues(e).toAggregateExpression()
        case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
          KMinValues(e, k).toAggregateExpression()
        case other => throw new graft.QueryExecutionException(
          s"kmv_distinct arity ${other.length}")
      },
      "built-in")
    (1 to 1000).toDF("v").createOrReplaceTempView("kmv_in")
    val k16 = spark.sql("SELECT kmv_distinct(v, 16) FROM kmv_in").head.getDouble(0)
    val k512 = spark.sql("SELECT kmv_distinct(v, 512) FROM kmv_in").head.getDouble(0)
    // k=512 > 1000? no: 512 < 1000 → sketch estimate; k=16 much coarser
    assert(math.abs(k512 - 1000) / 1000.0 < math.abs(k16 - 1000) / 1000.0 + 0.3)
    assert(k16 !== k512) // the k argument actually took effect
  }

  test("KMV per-group estimates track exact counts") {
    val li = graft.Tables.load(spark, sf001, "lineitem")
    val rows = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        KMinValues($"l_partkey", 256).as("est"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      assert(math.abs(est - exact) / exact < 0.2,
        s"${r.getString(0)}: $est vs $exact")
    }
  }
}
