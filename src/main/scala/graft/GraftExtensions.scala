package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: injects graft's custom Catalyst
  * functions into every session built with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * This is the idiomatic deployment path on a shared cluster — the
  * functions exist before any catalog or facade object is constructed,
  * so plain `spark.sql("SELECT rolling_hash(text) …")` works everywhere.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // anchored literal-prefix RLIKE (the dfsql LIKE lowering) →
    // StartsWith/EqualTo, which data sources can push down
    ext.injectOptimizerRule(_ => graft.rules.AnchoredRegexToPrefix)
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[expressions.RollingHash].getName, "rolling_hash"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          exprs match {
            case Seq(e) => expressions.RollingHash(e)
            case other => throw new graft.QueryExecutionException(
              s"rolling_hash expects 1 argument, got ${other.length}")
          }))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_distinct"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[expressions.KMinValues].getName, "kmv_distinct"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          exprs match {
            case Seq(e) =>
              expressions.KMinValues(e).toAggregateExpression()
            case Seq(e, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
              expressions.KMinValues(e, k).toAggregateExpression()
            case other => throw new graft.QueryExecutionException(
              "kmv_distinct expects (column[, k-int-literal]), got " +
                s"${other.length} args")
          }))
  }
}
