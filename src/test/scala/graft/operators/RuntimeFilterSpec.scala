package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = graft.Tables.load(spark, sf0001, "lineitem")
  private lazy val dim = graft.Tables.load(spark, sf0001, "orders")
    .filter($"o_totalprice" > 400000)

  test("bloomJoin equals the plain equi-join") {
    val viaBloom = RuntimeFilter.bloomJoin(li, dim, "l_orderkey", "o_orderkey",
      expectedKeys = 10000L)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = li.join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaBloom === plain)
    assert(plain.nonEmpty)
  }

  test("unsafe join types and non-integral keys are rejected up front") {
    // left outer would need the pruned rows back — must not run silently
    assertThrows[IllegalArgumentException](
      RuntimeFilter.bloomJoin(li, dim, "l_orderkey", "o_orderkey",
        joinType = "left"))
    // a string key would be cast to null inside the udf → empty result
    assertThrows[IllegalArgumentException](
      RuntimeFilter.bloomPrefilter(li, dim, "l_returnflag", "o_orderkey"))
  }

  test("bloom probe is the native codegen expression, not a Scala UDF") {
    val df = RuntimeFilter.bloomPrefilter(li, dim, "l_orderkey", "o_orderkey",
      expectedKeys = 10000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF probe found in plan:\n$plan")
    assert(df.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "native BloomFilterMightContain missing from optimized plan")
  }

  test("bloomPrefilter keeps every true match (no false negatives)") {
    val trueKeys = li.join(dim, $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val kept = RuntimeFilter.bloomPrefilter(li, dim, "l_orderkey", "o_orderkey",
      expectedKeys = 10000L)
      .select($"l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(kept)) // superset semantics: fp ok, fn never
  }
}
