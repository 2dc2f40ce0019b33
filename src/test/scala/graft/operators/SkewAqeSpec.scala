package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tools.{PlanInspect, SkewProbe}

/** AQE skew-join handling vs Skew.saltedJoin (round-8 verdict #5).
  * tools.SkewProbe measures the crossover at volume (ARCHITECTURE.md
  * §skew); this spec pins the PLAN property at CI scale: with the
  * detection thresholds scaled to test data, AQE must (a) mark the
  * sort-merge join skew-split on the planted hot key and (b) agree
  * exactly with the salted join's result — the contract the
  * "default to AQE, salt the exceptions" guidance rests on.
  */
class SkewAqeSpec extends SparkSpec {

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE skew-split activates on the planted hot key and matches the salted result") {
    withConfs(
      // force the sort-merge path (a broadcast dim side would bypass
      // the skew machinery entirely)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // detection thresholds scaled to CI data volume (defaults target
      // 256 MB cluster partitions)
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0") {
      val f = SkewProbe.fact(spark, 200000L, 1000L)
        .localCheckpoint() // detection reads real shuffle stats, not a range plan
      val d = SkewProbe.dim(spark, 1000L).localCheckpoint()

      val aqeDf = f.join(d, col("k") === col("dk"))
        .groupBy(col("attr"))
        .agg(count(lit(1)).as("n"), sum((col("v") * 10.0).cast("long")).as("sv"))
      val aqeRes = aqeDf.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val skewed = PlanInspect.nodes(aqeDf.queryExecution.executedPlan).exists {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s.isSkewJoin
        case _ => false
      }
      assert(skewed,
        "AQE did not mark the join skew-split on the planted hot key — " +
          "thresholds drifted or the plan shape changed; re-run " +
          "tools.SkewProbe before trusting the skew guidance")

      val saltRes = Skew.saltedJoin(f, d, "k", "dk",
          saltExpr = xxhash64(col("row_id")), salts = 4)
        .groupBy(col("attr"))
        .agg(count(lit(1)).as("n"), sum((col("v") * 10.0).cast("long")).as("sv"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(aqeRes.toSeq === saltRes.toSeq,
        "AQE skew-split and salted join disagree on the aggregated result")
      assert(aqeRes.nonEmpty)
    }
  }
}
