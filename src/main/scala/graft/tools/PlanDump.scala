package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the executed (final-AQE) formatted plan of registered queries to
  * files — the plans/r{N}/<query>_{before,after}.txt evidence the
  * optimization rounds commit (rule 8: collect() on the same
  * QueryExecution so the final adaptive plan is what's printed).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <name[,name...]> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 16) // the bench's tuned point
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize THIS QueryExecution's adaptive plan
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = new java.io.PrintWriter(s"$outDir/$name.txt")
      try f.println(plan) finally f.close()
      val exch = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
      println(s"[plandump] $name -> $outDir/$name.txt (Exchanges=$exch)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
