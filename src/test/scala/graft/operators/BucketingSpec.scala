package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("bucketed join runs with no exchange on either side") {
    // disable broadcast so the join exercises the bucketed SMJ path
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val df = Bucketing.bucketedJoin(spark, sf0001,
        "lineitem", "l_orderkey", "orders", "o_orderkey")
      df.collect() // finalize THIS queryExecution's AQE plan
      val nodes = graft.tools.PlanInspect.nodes(df.queryExecution.executedPlan)
      assert(nodes.exists(_.getClass.getSimpleName.contains("SortMergeJoin")),
        df.queryExecution.executedPlan.toString)
      assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "bucketed join must not shuffle:\n" +
          df.queryExecution.executedPlan.toString)
    }
  }

  test("bucketed join equals the plain join") {
    val viaBuckets = Bucketing.bucketedJoin(spark, sf0001,
      "lineitem", "l_orderkey", "orders", "o_orderkey")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = graft.Tables.load(spark, sf0001, "lineitem")
      .join(graft.Tables.load(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaBuckets === plain)
    assert(plain.nonEmpty)
  }

  test("bucketed tables are reused across invocations in one session") {
    val t1 = Bucketing.bucketedTable(spark, sf0001, "orders", "o_orderkey", 8)
    val t2 = Bucketing.bucketedTable(spark, sf0001, "orders", "o_orderkey", 8)
    assert(t1 === t2)
    assert(spark.catalog.tableExists(t1))
  }
}
