package graft.operators

import graft.SparkSpec

class AssociationSpec extends SparkSpec {
  import spark.implicits._

  // o1{A,B} o2{A,B} o3{A,C} o4{B,C} o5{A,B,C}, plus a duplicate (o1,A)
  // row that must collapse: N=5, c_A=4, c_B=4, c_C=3;
  // pair supports (A,B)=3, (A,C)=2, (B,C)=2.
  private def baskets = Seq(
    ("o1", "A"), ("o1", "A"), ("o1", "B"), ("o2", "A"), ("o2", "B"),
    ("o3", "A"), ("o3", "C"), ("o4", "B"), ("o4", "C"),
    ("o5", "A"), ("o5", "B"), ("o5", "C")).toDF("ok", "item")

  test("pairLift: exact supports and lift on a hand-checked basket set") {
    val out = Association.pairLift(baskets, "ok", "item", minSupport = 2)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B")) === ((3L, 15.0 / 16.0)))
    assert(out(("A", "C")) === ((2L, 10.0 / 12.0)))
    assert(out(("B", "C")) === ((2L, 10.0 / 12.0)))
  }

  test("pairLift: minSupport prunes below-threshold pairs") {
    val out = Association.pairLift(baskets, "ok", "item", minSupport = 3)
      .collect()
    assert(out.length === 1)
    assert((out.head.getString(0), out.head.getString(1)) === (("A", "B")))
  }

  test("pairLift rejects a non-positive minSupport") {
    intercept[IllegalArgumentException](
      Association.pairLift(baskets, "ok", "item", minSupport = 0))
  }
}
