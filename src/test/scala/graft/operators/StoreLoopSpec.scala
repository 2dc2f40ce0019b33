package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The daily-ingest LOOP contract: index the corpus once, then for each
  * day's batch — dedup against the store, append the survivors — and
  * the store stays equivalent to a from-scratch recompute. Two days are
  * enough to exercise every moving part: day 2 must see day 1's
  * survivors as settled corpus (through appended signature/shingle/df
  * files, including the partial-df merge) and must NOT see day 1's
  * dropped duplicates.
  */
class StoreLoopSpec extends SparkSpec {

  test("two-day store loop equals the recompute path day by day") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val day1 = col("doc_id") % 10 === 8
    val day2 = col("doc_id") % 10 === 9
    val dir = java.nio.file.Files.createTempDirectory("store_loop")
    try {
      // day 0: index the settled corpus
      Dedup.writeSignatureStore(docs.filter(!day1 && !day2), dir.toString)

      // day 1: dedup the batch against the store, fold survivors in
      val r1 = Dedup.dedupBatchAgainstStore(spark, docs.filter(day1),
        dir.toString, threshold = 0.5, maxDf = 20)
      val r1exp = Dedup.incrementalDedup(docs.filter(!day2), day1,
        threshold = 0.5, maxDf = 20)
      assert(r1.collect().toSeq.map(_.toSeq) === r1exp.collect().toSeq.map(_.toSeq),
        "day-1 store path diverged from recompute")
      val keep1 = r1.filter(col("keep")).select(col("doc_id"))
      Dedup.appendBatchToStore(
        docs.filter(day1).join(keep1, Seq("doc_id"), "left_semi"), dir.toString)

      // day 2: the appended store must behave exactly like a corpus of
      // (original ∪ day-1 survivors)
      val r2 = Dedup.dedupBatchAgainstStore(spark, docs.filter(day2),
        dir.toString, threshold = 0.5, maxDf = 20)
      val corpus2 = docs.filter(!day1 && !day2)
        .unionByName(docs.filter(day1).join(keep1, Seq("doc_id"), "left_semi"))
      val r2exp = Dedup.incrementalDedup(corpus2.unionByName(docs.filter(day2)),
        day2, threshold = 0.5, maxDf = 20)
      assert(r2.collect().toSeq.map(_.toSeq) === r2exp.collect().toSeq.map(_.toSeq),
        "day-2 store path diverged from recompute over corpus+day1-survivors")
      // the loop exercised real appends: df table must now hold partial
      // rows for at least one shingle shared between corpus and day 1
      val df = spark.read.parquet(s"$dir/df")
      assert(df.groupBy(col("sh")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).count() > 0,
        "append produced no partial df rows — the loop did not test the merge")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
