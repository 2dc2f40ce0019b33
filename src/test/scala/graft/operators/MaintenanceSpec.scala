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

  test("mergeAggDelta: inserts add, retractions subtract, zeroed groups vanish") {
    val view = Seq(("a", 2L, 20L), ("b", 1L, 5L), ("c", 3L, 30L))
      .toDF("k", "n", "s")
    val delta = Seq(
      ("a", 1L, 7L),    // insert into existing group
      ("b", -1L, -5L),  // retract b's only row → group must vanish
      ("d", 2L, 9L),    // brand-new group
      ("c", -1L, -10L)  // partial retraction
    ).toDF("k", "n", "s")
    val out = Maintenance.mergeAggDelta(view, delta, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(out === List(("a", 3L, 27L), ("c", 2L, 20L), ("d", 2L, 9L)))
  }

  test("mergeAggDelta equals the recompute on a composed base (IVM theorem)") {
    val base = (1L to 200L).map(i => (s"g${i % 7}", i)).toDF("k", "v")
    def agg(df: org.apache.spark.sql.DataFrame, sign: Long) =
      df.groupBy($"k").agg(
        (org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)) * sign).as("n"),
        (org.apache.spark.sql.functions.sum($"v") * sign).as("s"))
    val v0 = agg(base.filter($"v" % 10 =!= 9), 1L)
    val delta = agg(base.filter($"v" % 10 === 9), 1L)
      .unionByName(agg(base.filter($"v" % 20 === 3), -1L))
    val maintained = Maintenance.mergeAggDelta(v0, delta, Seq("k"))
    val recompute = agg(base.filter($"v" % 20 =!= 3), 1L)
    assert(maintained.exceptAll(recompute).count() === 0L)
    assert(recompute.exceptAll(maintained).count() === 0L)
  }

  test("mergeAggDelta rejects empty keys and value-less views") {
    val df = Seq(("a", 1L)).toDF("k", "n")
    intercept[IllegalArgumentException](
      Maintenance.mergeAggDelta(df, df, Seq.empty))
    val keysOnly = Seq(Tuple1("a")).toDF("k")
    intercept[IllegalArgumentException](
      Maintenance.mergeAggDelta(keysOnly, keysOnly, Seq("k")))
  }

  test("publishVersion: manifest-commit atomicity, crash invisibility, prune safety") {
    val root = java.nio.file.Files.createTempDirectory("pub_spec").toString
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val v2 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    assert(Maintenance.currentVersion(root).isEmpty)
    assert(Maintenance.publishVersion(v1, root) === 1L)
    assert(Maintenance.currentVersion(root) === Some(1L))
    assert(Maintenance.readPublished(spark, root).count() === 2L)
    assert(Maintenance.publishVersion(v2, root) === 2L)
    assert(Maintenance.readPublished(spark, root).count() === 3L)
    // a publisher that crashed AFTER writing data, BEFORE the flip:
    // invisible to readers, and the next publish reclaims its number
    Seq((9L, "z")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$root/v_3")
    assert(Maintenance.currentVersion(root) === Some(2L))
    assert(Maintenance.readPublished(spark, root).count() === 3L)
    assert(Maintenance.publishVersion(v1, root) === 3L,
      "retry must overwrite the crashed version's debris")
    assert(Maintenance.readPublished(spark, root).count() === 2L)
    // prune: committed version (3) and keep-window survive, older go
    Maintenance.pruneVersions(root, keep = 1)
    assert(!new java.io.File(s"$root/v_1").exists())
    assert(new java.io.File(s"$root/v_2").exists(), "keep=1 retains N-1")
    assert(new java.io.File(s"$root/v_3").exists())
    assert(Maintenance.readPublished(spark, root).count() === 2L)
  }
}
