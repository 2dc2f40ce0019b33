package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the dedup pipeline stages. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    val toks = split(trim(col("text")), "\\s+")
    time("tokens explode") {
      docs.repartition(col("doc_id"))
        .select(col("doc_id"), explode(toks).as("w")).count()
    }
    time("shingles explode (inline split — O(w²) antipattern)") {
      docs.repartition(col("doc_id"))
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("sh")).count()
    }
    time("shingles explode (materialized tokens)") {
      docs.repartition(col("doc_id"))
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"), explode(
          graft.functions.TextFunctions.shinglesFromTokens(col("toks"), 3)).as("sh"))
        .count()
    }
    time("minhash signatures") {
      graft.operators.Dedup.minhashSignatures(docs).count()
    }
    time("minhash pairs full") {
      graft.operators.Dedup.minhashPairs(docs).count()
    }
    time("ngram pairs full") {
      graft.operators.Dedup.ngramJaccardPairs(docs, maxDf = 20).count()
    }
    val pairs = graft.operators.Dedup
      .minhashVerifiedPairs(docs, threshold = 0.5, maxDf = 20)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    time("verified pairs (d44 input, checkpointed)") { pairs.count() }
    time("connected components (d44 CC stage)") {
      graft.operators.Dedup.connectedComponents(pairs).count()
    }
    println(s"[prof] cc probe iterations = ${graft.operators.Dedup.ccRoundsLastRun}")
    // phase breakdown of the CC loop on the same input
    val edges = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    time("cc: edges checkpoint") { edges.localCheckpoint().count() }
    val edgesC = edges.localCheckpoint()
    val seed = edgesC.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
    time("cc: seed checkpoint") { seed.localCheckpoint().count() }
    val seedC = seed.localCheckpoint()
    time("cc: one sum probe") {
      seedC.agg(sum(col("label").cast("decimal(38,0)"))).head; 1L
    }
    def ccStep(l: org.apache.spark.sql.DataFrame) =
      edgesC.join(l.select(col("id").as("dst"), col("label")), Seq("dst"))
        .select(col("src"), col("label"))
        .union(l.select(col("id").as("src"), col("label")))
        .groupBy(col("src")).agg(min(col("label")).as("label"))
        .select(col("src").as("id"), col("label"))
    time("cc: one double-step checkpoint") {
      ccStep(ccStep(seedC)).localCheckpoint().count()
    }

    // ---- d38 chain, materialization by materialization ----
    // Replays minhashVerifiedPairs stage-for-stage so each of its four
    // localCheckpoint jobs (plus the final verify job) is timed alone.
    println("[prof] ---- d38 minhashVerifiedPairs breakdown ----")
    import graft.operators.Dedup
    for (round <- 1 to 2) {
      println(s"[prof] -- run $round --")
      var ex: org.apache.spark.sql.DataFrame = null
      var sigs: org.apache.spark.sql.DataFrame = null
      var cands: org.apache.spark.sql.DataFrame = null
      time("d38.1 ex = shingleHashTable ckpt") {
        ex = Dedup.shingleHashTable(docs, 3).localCheckpoint(); ex.count()
      }
      time("d38.2 sigs = signatures ckpt") {
        sigs = Dedup.signaturesFromShingles(ex, 16).localCheckpoint(); sigs.count()
      }
      time("d38.3+4 cands (banded ckpt + self-join)") {
        cands = Dedup.candidatesFromSignatures(
          sigs.select(col("doc_id"), col("sig")), 16, 4)
        cands.count()
      }
      time("d38.5 verify (bounded ckpt + final)") {
        Dedup.verifyFromShingles(ex, cands, 0.5, 20,
          precomputedSizes = Some(sigs.select(col("doc_id"), col("sz")))).count()
      }
    }
    spark.stop()
  }
}
