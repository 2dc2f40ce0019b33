package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** d73's approximation contract: the LSH-shortlist decontam must agree
  * with the dense d69 scan on the FLAG decision — near-duplicates at
  * contamination cosines collide with probability ≈ 1 under one probe
  * bit, so a planted paraphrase is flagged by both paths with the same
  * nearest item, and the organic (unflaggable) corpus yields identical
  * all-false flags. The 525k probe measures the same agreement plus
  * the speedup at volume; this spec pins it at gate scale including a
  * positive case the gate corpus lacks.
  */
class DecontamParitySpec extends SparkSpec {
  import spark.implicits._

  test("ANN shortlist agrees with the dense scan; planted paraphrase caught") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val b0 = emb.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding")).collect()(0)
    val jittered = b0.getSeq[Float](1).toArray
      .zipWithIndex.map { case (x, i) => if (i == 0) x + 0.001f else x }
    val planted = Seq((99999L, jittered)).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
    val all = emb.unionByName(planted)
    def flags(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val dense = flags(Similarity.semanticDecontam(all))
    val ann = flags(Similarity.semanticDecontamAnn(all))
    assert(dense.keySet === ann.keySet, "row sets diverged")
    // flag decisions agree everywhere; flagged rows agree on the match
    dense.foreach { case (id, (f, nb)) =>
      assert(ann(id)._1 === f, s"flag diverged for $id")
      if (f) assert(ann(id)._2 === nb, s"nearest diverged for flagged $id")
    }
    assert(dense(99999L) === ((true, 0L)), "planted paraphrase not caught")
    assert(dense.count(_._2._1) === 1, "organic vectors should not flag")
  }
}
