package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan auditor: prints a per-query summary of the physical-plan
  * properties that matter at scale — parquet filter pushdown, column
  * pruning (ReadSchema width), join strategies, whole-stage codegen
  * coverage — plus the full formatted plan when a query name is passed.
  *
  * Usage: runMain graft.tools.ExplainAudit [sfDir] [queryName]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = only.map(Seq(_)).getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // execute THIS queryExecution: finalizes the AQE plan
                   // (count()/foreach() would build a separate one)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      if (only.isDefined) println(plan)
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(plan).length
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1).count(_ == ':')).toSeq
      val bhj = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).length
      val bnlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(plan).length
      val smj = "\\(\\d+\\) SortMergeJoin".r.findAllIn(plan).length
      val codegenIds = PlanInspect.nodes(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
      val exch = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
      println(f"[audit] $name%-22s scans=$scans cols=${readSchemas.mkString("/")}%-12s " +
        f"pushed=$pushed%-5s bcast=${bhj + bnlj} smj=$smj shuffles=$exch codegenSpans=$codegenIds")
    }
    spark.stop()
  }
}
