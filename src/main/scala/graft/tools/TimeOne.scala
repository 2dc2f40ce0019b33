package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single registered query: runMain graft.tools.TimeOne <name> [sfDir] [n] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // mirror Bench's between-sample hygiene unless disabled
    val unpersist = !sys.env.get("TIMEONE_NO_UNPERSIST").contains("1")
    (1 to n).foreach { i =>
      // scoped like Bench (ADVICE r14 #1): only RDDs persisted during
      // this run are dropped; anything persisted before it survives
      val preexisting = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[time] $name run$i rows=$c ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (unpersist)
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => preexisting.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
