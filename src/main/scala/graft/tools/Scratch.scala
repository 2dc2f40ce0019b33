package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

/** Throwaway stage-level profiler for the optimization round (not part
  * of the driver surface). */
object Scratch {
  def t[A](tag: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.Tables.load(spark, sfDir, "documents")

    (1 to 2).foreach { round =>
      println(s"[scratch] ---- round $round ----")
      // minhashVerifiedPairs decomposition
      val ex = t("mh: shingleHashTable+mat") {
        graft.operators.Dedup.shingleHashTable(docs, 3).materializeOnce()
      }
      val sigs = t("mh: signatures+mat") {
        graft.operators.Dedup.signaturesFromShingles(ex, 16).materializeOnce()
      }
      val cands = t("mh: candidates.noop") {
        val c = graft.operators.Dedup.candidatesFromSignatures(
          sigs.select(col("doc_id"), col("sig")), 16, 4)
        noop(c); c
      }
      t("mh: verify.noop") {
        noop(graft.operators.Dedup.verifyFromShingles(ex, cands, 0.5, 20,
          precomputedSizes = Some(sigs.select(col("doc_id"), col("sz")))))
      }
      t("mh: full verified count") {
        graft.operators.Dedup.minhashVerifiedPairs(docs, threshold = 0.5,
          maxDf = 20).count()
      }
      t("wn: winnowing count") {
        graft.operators.Dedup.winnowingPairs(docs, oracleHash = true).count()
      }
      t("cc: CC over mh pairs") {
        graft.operators.Dedup.connectedComponents(
          graft.operators.Dedup.minhashVerifiedPairs(docs, threshold = 0.5,
            maxDf = 20).select(col("id_a"), col("id_b"))).count()
      }
      t("q182: pairEvidence count") {
        graft.operators.Dedup.pairEvidence(docs,
          graft.operators.Dedup.minhashVerifiedPairs(docs, threshold = 0.5,
            maxDf = 20)).count()
      }
      t("d57: prefix join count") {
        graft.operators.Dedup.prefixJaccardJoin(docs).count()
      }
      // new-path stage decomposition
      locally {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.TextFunctions
        val ex = t("d57x: ex+mat") {
          docs.repartition(col("doc_id"))
            .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
            .select(col("doc_id"), explode(
              TextFunctions.shinglesFromTokens(col("toks"), 3)).as("sh"))
            .materializeOnce()
        }
        val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        val rankW = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
        val plen = col("sz") - floor((col("sz") * 1 + 1) / lit(2.0)) + 1
        val prefix = ex.join(dfreq, Seq("sh"))
          .withColumn("rn", row_number().over(rankW))
          .join(sizes, Seq("doc_id"))
          .filter(col("rn") <= plen)
          .select(col("sh"), col("doc_id"))
        val cand = prefix.select(col("sh"), col("doc_id").as("id_a"))
          .join(prefix.select(col("sh"), col("doc_id").as("id_b")), Seq("sh"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        t("d57x: cand.noop")(noop(cand))
        println(s"[scratch] d57x counts: ex=${ex.count()} cand=${cand.count()}")
        val bounded = t("d57x: bounded+mat") {
          cand
            .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
            .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
            .filter(least(col("sz_a"), col("sz_b")) * lit(2L)
              >= lit(1L) * greatest(col("sz_a"), col("sz_b")))
            .materializeOnce()
        }
        val candIds = bounded.select(col("id_a").as("doc_id"))
          .union(bounded.select(col("id_b").as("doc_id"))).distinct()
        val exC = ex.join(candIds, Seq("doc_id"), "left_semi")
        t("d57x: exC.noop")(noop(exC))
        println(s"[scratch] d57x counts: bounded=${bounded.count()} " +
          s"candIds=${candIds.count()} exC=${exC.count()} " +
          s"mid=${bounded.select(col("id_a"), col("id_b"))
            .join(exC.select(col("doc_id").as("id_a"), col("sh")), Seq("id_a")).count()}")
        val inter = bounded.select(col("id_a"), col("id_b"))
          .join(exC.select(col("doc_id").as("id_a"), col("sh")), Seq("id_a"))
          .join(exC.select(col("doc_id").as("id_b"), col("sh")), Seq("id_b", "sh"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
        t("d57x: inter.noop")(noop(inter))
        t("d57x: final.count") {
          inter.join(bounded, Seq("id_a", "id_b"))
            .filter(lit(3L) * col("inter") >= lit(1L) * (col("sz_a") + col("sz_b")))
            .select(col("id_a"), col("id_b"), col("inter"),
              (col("inter") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
            .orderBy(col("id_a"), col("id_b")).count()
        }
      }
      t("d64: blocking audit count") {
        graft.operators.Linkage.blockingAudit(
          graft.operators.Dedup.prefixJaccardJoin(docs)
            .select(col("id_a"), col("id_b")),
          docs.select(col("doc_id"),
            org.apache.spark.sql.functions.expr("n_chars DIV 32").as("bk"))).count()
      }
      t("d60: shingle curve count") {
        graft.SparkEntry.queries("d60_shingle_curve")(spark, sfDir).count()
      }
      t("q206: hits count") {
        graft.SparkEntry.queries("q206_hits")(spark, sfDir).count()
      }
      t("m60: video neardup count") {
        graft.SparkEntry.queries("m60_video_neardup")(spark, sfDir).count()
      }
      t("d43a: simhashPairs count") {
        graft.operators.Dedup.simhashPairs(docs, maxHamming = 8,
          oracleHash = true).count()
      }
      t("d43b: simhash only count") {
        noop(graft.operators.Dedup.simhash(docs, oracleHash = true))
      }
      t("d43: simhashVerified count") {
        graft.SparkEntry.queries("d43_simhash_verified")(spark, sfDir).count()
      }
      locally {
        val cands43 = graft.operators.Dedup.simhashPairs(docs, 8,
          oracleHash = true).select(col("id_a"), col("id_b"))
        t("d43x: cands.noop")(noop(cands43))
        val ex43 = t("d43x: ex+mat") {
          graft.operators.Dedup.shingleHashTable(docs, 3).materializeOnce()
        }
        t("d43x: verify.noop") {
          noop(graft.operators.Dedup.verifyFromShingles(ex43, cands43, 0.5, 20))
        }
        val sizes43 = t("d43x: sizes+mat") {
          ex43.groupBy(col("doc_id")).agg(count(lit(1)).as("sz")).materializeOnce()
        }
        val bounded43 = t("d43x: bounded+mat") {
          cands43
            .join(sizes43.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
            .join(sizes43.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
            .filter(least(col("sz_a"), col("sz_b")).cast("double") /
              greatest(col("sz_a"), col("sz_b")) >= 0.5)
            .materializeOnce()
        }
        val candIds43 = bounded43.select(col("id_a").as("doc_id"))
          .union(bounded43.select(col("id_b").as("doc_id"))).distinct()
        val keep43 = ex43.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20).select(col("sh"))
        t("d43x: keep.noop")(noop(keep43))
        val filtered43 = ex43.join(candIds43, Seq("doc_id"), "left_semi")
          .join(keep43, Seq("sh"))
        t("d43x: filtered.noop")(noop(filtered43))
        val inter43 = bounded43.select(col("id_a"), col("id_b"))
          .join(filtered43.select(col("doc_id").as("id_a"), col("sh")), Seq("id_a"))
          .join(filtered43.select(col("doc_id").as("id_b"), col("sh")), Seq("id_b", "sh"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
        t("d43x: inter.noop")(noop(inter43))
        inter43.collect()
        println(inter43.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      t("s60: nprobe curve count") {
        graft.SparkEntry.queries("s60_ivf_nprobe_curve")(spark, sfDir).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
