package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Linkage.FieldWeight

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fellegiSunterHistogram: hand-computed scores on one block") {
    // one block, three records; fields (seg, band) with weights
    // +8/−2 and +11/−1. Pairs: (1,2) agree both → 19; (1,3) agree seg
    // only → 8−1 = 7; (2,3) agree seg only → 7.
    val recs = Seq(
      (1L, 7L, "AUTO", 10L),
      (2L, 7L, "AUTO", 10L),
      (3L, 7L, "AUTO", 99L)
    ).toDF("id", "blk", "seg", "band")
    val hist = Linkage.fellegiSunterHistogram(recs, col("id"), col("blk"),
      Seq(FieldWeight(col("seg"), 8L, -2L), FieldWeight(col("band"), 11L, -1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hist === Map(19L -> 1L, 7L -> 2L), hist)
  }

  test("fellegiSunterHistogram: oversized blocks are skipped entirely") {
    val big = (1L to 50L).map(i => (i, 1L, "X", 0L))
    val small = Seq((100L, 2L, "X", 0L), (101L, 2L, "X", 0L))
    val recs = (big ++ small).toDF("id", "blk", "seg", "band")
    val hist = Linkage.fellegiSunterHistogram(recs, col("id"), col("blk"),
      Seq(FieldWeight(col("seg"), 8L, -2L)), maxBlock = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // only the 2-record block survives: one agreeing pair at score 8
    assert(hist === Map(8L -> 1L), hist)
  }

  test("blockingAudit: hand-computed completeness and reduction ratio") {
    // 6 records, blocks: {1,2,3} and {4,5} and {6}; candidates = 3+1 = 4
    // of C(6,2)=15; truth pairs (1,2) same block, (3,4) split → pc=0.5
    val keyed = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("doc_id", "bk")
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val row = Linkage.blockingAudit(truth, keyed).head()
    assert(row.getLong(0) === 6L) // n_records
    assert(row.getLong(1) === 2L) // n_true
    assert(row.getDouble(2) === 4.0) // n_cand (DOUBLE: cand2/2, rule 18)
    assert(row.getLong(3) === 1L) // n_found
    assert(row.getDouble(4) === 0.5) // pairs_completeness
    assert(row.getDouble(5) === 1.0 - 4.0 / 15.0) // reduction_ratio
  }
}
