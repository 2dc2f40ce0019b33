package graft.operators

import java.io.File
import java.nio.file.Files

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet collapses the file count and preserves every row") {
    val root = Files.createTempDirectory("graft_compact").toFile
    root.deleteOnExit()
    val src = new File(root, "frag").getAbsolutePath
    val dst = new File(root, "compact").getAbsolutePath
    (0L until 1000L).toDF("id").repartition(32)
      .write.mode("overwrite").parquet(src)
    assert(Maintenance.parquetFileCount(new File(src)) === 32L)

    val n = Maintenance.compactParquet(spark, src, dst,
      targetFileBytes = 1024L * 1024)
    assert(n === 1L) // 1000 longs ≪ 1 MiB target
    assert(Maintenance.parquetFileCount(new File(dst)) === 1L)
    // byte-identical content: same rows, same values
    val back = spark.read.parquet(dst).as[Long].collect().sorted
    assert(back === (0L until 1000L).toArray)
  }

  test("compactParquet rejects a non-positive target") {
    intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, "/tmp/x", "/tmp/y", 0L)
    }
  }
}
