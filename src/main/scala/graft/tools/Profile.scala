package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the dedup pipeline stages. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
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
    spark.stop()
  }
}
