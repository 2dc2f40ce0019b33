package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted-signature incremental dedup (d53) contract: dedup of a
  * batch against a PRIOR-RUN signature store must produce exactly what
  * the recompute path (incrementalDedup over corpus ∪ batch) produces —
  * the store is an index, not a semantic variant. The d53 gate shares
  * d47's oracle on the strength of this equality.
  */
class SignatureStoreSpec extends SparkSpec {

  private def run(threshold: Double, maxDf: Int): Unit = {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val isBatch = col("doc_id") % 10 === 9
    val dir = java.nio.file.Files.createTempDirectory("sigstore_spec")
    try {
      Dedup.writeSignatureStore(docs.filter(!isBatch), dir.toString)
      val store = Dedup.dedupBatchAgainstStore(spark,
        docs.filter(isBatch), dir.toString, threshold, maxDf)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      val recompute = Dedup.incrementalDedup(docs, isBatch, threshold, maxDf)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      assert(store.toSeq === recompute.toSeq,
        s"store path diverged from recompute path (threshold=$threshold, maxDf=$maxDf)")
      // the split must actually exercise all three outcomes or the
      // equality is vacuous on the interesting branches
      val reasons = store.map(_._3).toSet
      assert(reasons.contains("unique"), s"no unique docs at sf0.001: $reasons")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }

  test("store path equals recompute path at gate parameters (0.5, df<=20)") {
    run(threshold = 0.5, maxDf = 20)
  }

  test("store path equals recompute path at a loose threshold (0.3, df<=100)") {
    // looser threshold surfaces more corpus_dup/batch_dup rows, so the
    // equality covers the drop branches, not just 'unique'
    run(threshold = 0.3, maxDf = 100)
  }

  test("store tables carry the expected schemas") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words in this tiny document here now")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sigstore_schema")
    try {
      Dedup.writeSignatureStore(docs, dir.toString)
      val sigs = spark.read.parquet(s"$dir/signatures")
      assert(sigs.columns.toSet === Set("doc_id", "sz", "sig"))
      assert(sigs.count() === 3)
      val sh = spark.read.parquet(s"$dir/shingles")
      assert(sh.columns.toSet === Set("doc_id", "sh"))
      val df = spark.read.parquet(s"$dir/df")
      assert(df.columns.toSet === Set("sh", "df"))
      // identical docs share every shingle: df table must show df=2 rows
      assert(df.filter(col("df") === 2).count() > 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
