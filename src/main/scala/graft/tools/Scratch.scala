package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

/** Throwaway stage-level profiler for the optimization round (not part
  * of the driver surface). r15 edition: q214 / d64 / q206 / d60 / d43
  * decompositions. */
object Scratch {
  def t[A](tag: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%.3f s")
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
    val D = graft.operators.Dedup

    def unpersistAll(): Unit =
      spark.sparkContext.getPersistentRDDs.values

    // ---- A/B 1: d43 with vs without the shared tokens checkpoint ----
    // A = current operator (shared toks materializeOnce feeds simhash
    //     vote AND shingle table)
    // B = packed vote + unsorted candidates, but two independent
    //     tokenize pipelines (the pre-sharing shape)
    (1 to 3).foreach { r =>
      t(s"d43 A shared-toks     r$r") {
        D.simhashVerifiedPairs(docs, 8, 0.5, 3, 20, oracleHash = true).count()
      }
      unpersistAll()
      t(s"d43 B separate-toks   r$r") {
        D.verifyPairsByJaccard(docs,
          D.simhashPairsFromFp(D.simhash(docs, oracleHash = true), 8)
            .select(col("id_a"), col("id_b")),
          3, 0.5, 20).count()
      }
      unpersistAll()
    }

    // ---- A/B 2: CC pointer jump effect on the winnowing graph ----
    // current CC has the jump; the no-jump variant is inlined below.
    def ccNoJump(pairs: DataFrame): DataFrame = {
      val edges = pairs
        .select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .materializeOnce()
      var labels = edges.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("label"))
        .select(col("src").as("id"), col("label"))
      def step(l: DataFrame): DataFrame =
        edges.join(l.select(col("id").as("dst"), col("label")), Seq("dst"))
          .select(col("src"), col("label"))
          .union(l.select(col("id").as("src"), col("label")))
          .groupBy(col("src")).agg(min(col("label")).as("label"))
          .select(col("src").as("id"), col("label"))
      def ckpt(l: DataFrame): (DataFrame, java.math.BigDecimal) = {
        val obs = org.apache.spark.sql.Observation()
        val ck = l.observe(obs,
          sum(col("label").cast("decimal(38,0)")).as("s")).materializeOnce()
        val s = Option(obs.get("s").asInstanceOf[java.math.BigDecimal])
          .getOrElse(java.math.BigDecimal.ZERO)
        (ck, s)
      }
      val (seed, seedSum) = ckpt(labels)
      labels = seed
      var prevSum = seedSum
      var rounds = 0
      var converged = false
      while (!converged && rounds < 50) {
        val (updated, s) = ckpt(step(step(labels)))
        converged = s == prevSum
        prevSum = s
        labels = updated
        rounds += 1
      }
      println(s"[scratch] ccNoJump rounds=$rounds")
      labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
    }

    (1 to 3).foreach { r =>
      val wnp = D.winnowingPairs(docs, oracleHash = true)
        .select(col("id_a"), col("id_b")).materializeOnce()
      wnp.count()
      t(s"cc(wn) WITH jump      r$r") { D.connectedComponents(wnp).count() }
      println(s"[scratch] cc jump rounds=${D.ccRoundsLastRun}")
      t(s"cc(wn) no jump        r$r") { ccNoJump(wnp).count() }
      unpersistAll()
    }

    spark.stop()
  }
}
