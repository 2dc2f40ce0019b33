package graft.tools

import org.apache.spark.sql.SparkSession

/** Time several registered queries in one JVM (min-of-n each, Bench-style
  * scoped unpersist between runs):
  * runMain graft.tools.TimeMany <name[,name...]> [sfDir] [n]
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", 16) // the bench's tuned point
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // page-cache / JIT warm-up, untimed
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val preexisting = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => preexisting.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
        System.gc()
        dt
      }
      println(f"[timemany] $name%-28s min=${times.min}%.3f " +
        f"all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
