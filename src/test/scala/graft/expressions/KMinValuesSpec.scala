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
