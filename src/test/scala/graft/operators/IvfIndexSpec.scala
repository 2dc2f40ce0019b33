package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s51's store ≡ recompute contract (the d53/SignatureStoreSpec shape
  * for vectors): IVF search against the persisted index must return
  * row-for-row what ivfSearch computes from the raw corpus — floats
  * and fixed-point centroids round-trip parquet bit-exactly, and the
  * search core is shared.
  */
class IvfIndexSpec extends SparkSpec {

  test("searchIvfIndex equals ivfSearch on the same corpus") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 7)
    val dir = java.nio.file.Files.createTempDirectory("ivf_spec").toString
    Similarity.writeIvfIndex(emb, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq
    val fromStore = rows(Similarity.searchIvfIndex(spark, queries, dir, k = 10))
    val recomputed = rows(Similarity.ivfSearch(emb, queries, k = 10))
    assert(fromStore === recomputed,
      "persisted-index search diverged from the recompute path")
    assert(fromStore.nonEmpty)
  }
}
