package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: time a set of representative registered queries under a
  * given thread/shuffle-partition count, to size the bench session against
  * the current boot. runMain graft.tools.PartProbe <threads> <partitions> */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val threads = args.lift(0).getOrElse("32")
    val parts = args.lift(1).getOrElse(threads)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q01_projection", "q03_agg_group", "q22_flagship",
      "q52_tpch_q1", "q54_tpch_q5", "q115_tpch_q10", "d36_dedup_exact",
      "d38_minhash_lsh", "q148_pagerank", "s41_knn_brute", "t38_tfidf",
      "q123_heavy_hitters")
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach(n => try graft.SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => })
    val total = names.map { n =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val m = ts.min
      println(f"[probe] $n%-22s $m%.3f")
      m
    }.sum
    println(f"[probe] TOTAL threads=$threads parts=$parts $total%.3f")
    spark.stop()
  }
}
