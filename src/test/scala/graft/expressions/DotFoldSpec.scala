package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotFoldSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.load(spark, sf0001, "embeddings")

  /** The HOF tree DotFold replaced — kept here as the reference. */
  private def hofDot(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bitwise-identical to the HOF fold on real embeddings") {
    val both = emb.select(
      DotFold($"embedding", $"embedding").as("native"),
      hofDot($"embedding", $"embedding").as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("codegen and interpreted paths agree") {
    val expected = emb.select(DotFold($"embedding", $"embedding"))
      .collect().map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = emb.select(DotFold($"embedding", $"embedding"))
        .collect().map(_.getDouble(0))
      assert(interp.toSeq === expected.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("mixed float x double-literal side matches the HOF fold bitwise") {
    val plane = Array.tabulate(64)(i => math.sin(i + 1)) // any doubles
    val planeCol = array(plane.map(lit): _*)
    val both = emb.select(
      DotFold($"embedding", planeCol).as("native"),
      hofDot($"embedding", planeCol).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("length mismatch and null element yield null, like zip_with padding") {
    val df = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)) // mismatched dims
    ).toDF("a", "b")
    assert(df.select(DotFold($"a", $"b")).head.isNullAt(0))
    val withNull = df.select(
      array(lit(1f), lit(null).cast("float")).as("x"),
      array(lit(1f), lit(2f)).as("y"))
    assert(withNull.select(DotFold($"x", $"y")).head.isNullAt(0))
  }
}
