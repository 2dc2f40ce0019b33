package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-phase distributed skyline (q155): the pruning must be exactly
  * dominance-preserving — phase 1 may only drop locally-dominated
  * points (the distributive property), and duplicate criterion vectors
  * all survive.
  */
class SkylineSpec extends SparkSpec {

  test("skyline equals the brute-force dominance definition") {
    import spark.implicits._
    // deterministic pseudo-random 2-d points across several partitions
    val pts = (0L until 400L).map { i =>
      val x = (i * 2654435761L % 997L).toDouble
      val y = ((i * 40503L + 7L) % 991L).toDouble
      (i, x, y)
    }
    val df = pts.toDF("id", "x", "y").repartition(8)
    val got = Skyline.skyline(spark, df, "id",
        minimize = Seq("x"), maximize = Seq("y"))
      .collect().map(_.getLong(0)).toSet
    def dom(a: (Long, Double, Double), b: (Long, Double, Double)) =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    val expected = pts.filter(p => !pts.exists(q => dom(q, p))).map(_._1).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("duplicate criterion vectors all survive (no strict dominance)") {
    import spark.implicits._
    val df = Seq((1L, 1.0, 5.0), (2L, 1.0, 5.0), (3L, 2.0, 4.0))
      .toDF("id", "x", "y").repartition(3)
    val got = Skyline.skyline(spark, df, "id",
        minimize = Seq("x"), maximize = Seq("y"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }
}
