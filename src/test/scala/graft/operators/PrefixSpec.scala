package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prefix.cumsum is the one decomposition every CDF-shaped operator
  * rests on (KS, Mann–Whitney, quantile normalization): these tests pin
  * that the bucketed two-pass prefix sum equals the global ordered
  * window BIT-FOR-BIT, including at bucket boundaries, with multiple
  * accumulated columns, and in the exclusive form.
  */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random support: scattered x values (gaps,
  // negatives) so rows straddle many bucket boundaries
  private def frame(n: Int) = {
    val rows = (1 to n).map { i =>
      val x = (i.toLong * 2654435761L % 100003L) - 50000L
      (x, (i % 7).toLong + 1L, (i % 3).toLong)
    }
    rows.toDF("x", "c1", "c2").groupBy("x")
      .agg(sum("c1").as("c1"), sum("c2").as("c2"))
  }

  test("inclusive cumsum over two columns equals the global window exactly") {
    val df = frame(5000)
    val got = Prefix.cumsum(df, "x", Seq("c1" -> "f1", "c2" -> "f2"),
        inclusive = true, buckets = 16)
      .select("x", "f1", "f2")
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("x"),
      sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("exclusive cumsum equals the global window (first row gets 0)") {
    val df = frame(1000)
    val got = Prefix.cumsum(df, "x", Seq("c1" -> "before"),
        inclusive = false, buckets = 8)
      .select("x", "before")
    val w = Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("x"),
      coalesce(sum(col("c1")).over(w), lit(0L)).as("before"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("degenerate supports: one row, and fewer rows than buckets") {
    val one = Seq((42L, 5L)).toDF("x", "c")
    val r1 = Prefix.cumsum(one, "x", Seq("c" -> "f"), inclusive = true)
      .select("x", "f").as[(Long, Long)].collect()
    assert(r1.toSeq === Seq((42L, 5L)))
    val few = Seq((1L, 1L), (2L, 10L), (9L, 100L)).toDF("x", "c")
    val r2 = Prefix.cumsum(few, "x", Seq("c" -> "f"), inclusive = true,
        buckets = 256)
      .select("x", "f").orderBy("x").as[(Long, Long)].collect()
    assert(r2.toSeq === Seq((1L, 1L), (2L, 11L), (9L, 111L)))
  }

  test("every window in the plan is bucket-partitioned (no single-partition sort)") {
    val df = frame(2000)
    val got = Prefix.cumsum(df, "x", Seq("c1" -> "f1"), inclusive = true)
    val plan = graft.tools.PlanInspect.formatted(got)
    val specs = "windowspecdefinition\\(([^)]*?)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, plan)
    assert(specs.forall(_.contains("p_bkt")), specs)
  }

  test("cummax equals the global ordered running max exactly") {
    val df = frame(5000).withColumnRenamed("c1", "v")
    val got = Prefix.cummax(df, "x", "v", "m", buckets = 16)
      .select("x", "m")
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("x"), max(col("v")).over(w).as("m"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // grouped form: each group's running max is independent
    val g = frame(2000).withColumn("g", pmod(col("x"), lit(3)).cast("long"))
      .withColumnRenamed("c2", "v")
      // pmod of negative x is still non-negative; keys non-null as required
    val gotG = Prefix.cummax(g, "x", "v", "m", buckets = 8,
        groupCols = Seq("g")).select("g", "x", "m")
    val wg = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantG = g.select(col("g"), col("x"), max(col("v")).over(wg).as("m"))
    assert(gotG.exceptAll(wantG).isEmpty && wantG.exceptAll(gotG).isEmpty)
  }
}
