package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access over the driver-generated parquet dirs
  * (/root/testdata/sf*). The reference engine lazily loads CSV files into
  * memory per table (reference: dfsql/table.py:51-72); here a "load" is just
  * declaring a parquet scan — Catalyst prunes columns and pushes filters into
  * the scan, so declaring the full table costs nothing.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark won't read
      // natively; read the raw int64 nanos and floor to microseconds.
      // (DuckDB keeps full ns — queries must never project raw ts, only
      // values coarser than 1µs, e.g. date_trunc buckets.)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    case _ =>
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every test table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
