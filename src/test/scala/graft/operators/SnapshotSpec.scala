package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "val")

  test("cdcMerge applies latest-wins upserts, deletes, inserts; keeps untouched rows") {
    val changes = Seq(
      (1L, "U", 11.0, 100L), // update, superseded...
      (1L, "U", 12.0, 200L), // ...by this later seq
      (2L, "D", 0.0, 150L),  // delete tombstone
      (4L, "U", 40.0, 300L)  // insert (key not in base)
    ).toDF("id", "op", "val", "seq")
    val out = Snapshot.cdcMerge(base, changes, "id", "op", "seq")
      .orderBy("id")
      .select("id", "val", "row_src").as[(Long, Double, String)].collect()
    assert(out === Array(
      (1L, 12.0, "upsert"), // latest change wins
      (3L, 30.0, "base"),   // untouched
      (4L, 40.0, "upsert"))) // inserted; id 2 deleted
  }

  test("cdcMerge resurrects a deleted key when a later upsert follows the tombstone") {
    val changes = Seq(
      (3L, "D", 0.0, 100L),
      (3L, "U", 33.0, 200L)).toDF("id", "op", "val", "seq")
    val out = Snapshot.cdcMerge(base, changes, "id", "op", "seq")
      .filter($"id" === 3L).select("val").as[Double].collect()
    assert(out === Array(33.0))
  }

  test("cdcMerge falls back to the base value on a null payload (partial update)") {
    val changes = Seq((1L, "U", Option.empty[Double], 100L))
      .toDF("id", "op", "val", "seq")
    val out = Snapshot.cdcMerge(base, changes, "id", "op", "seq")
      .filter($"id" === 1L).select("val", "row_src")
      .as[(Double, String)].collect()
    assert(out === Array((10.0, "upsert")))
  }

  test("scd2History chains validity intervals per key; last version open-ended") {
    val changes = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 2L, 2.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 3L, 9.0)
    ).toDF("k", "ts", "seq", "v")
    val out = Snapshot.scd2History(changes, "k", "ts", "seq")
      .orderBy("k", "version")
      .select("k", "version", "valid_to").collect()
    assert(out.length === 3)
    assert(out(0).getLong(1) === 1L)
    assert(out(0).getTimestamp(2) ===
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00")) // closed by v2
    assert(out(1).isNullAt(2))  // current version of key 1
    assert(out(2).isNullAt(2))  // only version of key 2
  }

  test("scd2History breaks same-second ties by the sequence column") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val changes = Seq((1L, t, 2L, 20.0), (1L, t, 1L, 10.0))
      .toDF("k", "ts", "seq", "v")
    val out = Snapshot.scd2History(changes, "k", "ts", "seq")
      .orderBy("version").select("seq").as[Long].collect()
    assert(out === Array(1L, 2L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldS = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "val")
    val newS = Seq((2L, 21.0), (3L, 30.0), (4L, 40.0)).toDF("id", "val")
    val out = Snapshot.snapshotDiff(oldS, newS, "id")
      .orderBy("id")
      .select("id", "status").as[(Long, String)].collect()
    assert(out === Array(
      (1L, "removed"), (2L, "changed"), (3L, "unchanged"), (4L, "added")))
  }

  test("snapshotDiff compares payloads null-safely") {
    val oldS = Seq((1L, Option(1.0)), (2L, Option.empty[Double])).toDF("id", "val")
    val newS = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double])).toDF("id", "val")
    val out = Snapshot.snapshotDiff(oldS, newS, "id")
      .orderBy("id").select("status").as[String].collect()
    assert(out === Array("changed", "unchanged")) // null vs 1.0 differs; null==null doesn't
  }

  test("asOf replays only the log prefix seq <= upTo") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "val")
    val log = Seq(
      (1L, "U", 11.0, 100L), // applied (seq <= 150)
      (2L, "D", 0.0, 120L),  // applied: key 2 deleted at 150
      (1L, "U", 12.0, 200L), // future: must NOT apply
      (2L, "U", 22.0, 300L)  // future resurrect: must NOT apply
    ).toDF("id", "op", "val", "event_id")
    val at150 = Snapshot.asOf(base, log, "id", "op", "event_id", 150L)
      .orderBy("id").select("id", "val").as[(Long, Double)].collect()
    assert(at150 === Array((1L, 11.0)))
    val at300 = Snapshot.asOf(base, log, "id", "op", "event_id", 300L)
      .orderBy("id").select("id", "val").as[(Long, Double)].collect()
    assert(at300 === Array((1L, 12.0), (2L, 22.0)))
  }

  test("deleteCascadeAudit sizes the cascade and proves zero orphans") {
    import org.apache.spark.sql.functions.col
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (20L, 2L), (30L, 4L), (40L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1), (10L, 2), (20L, 1), (30L, 1), (40L, 1))
      .toDF("l_orderkey", "l_linenumber")
    // delete even customers {2,4} -> orders {20,30} -> 2 lineitems
    val out = Snapshot.deleteCascadeAudit(customer, orders, lineitem,
      col("c_custkey") % 2 === 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("customer", 4L, 2L, 2L, 0L),
      ("lineitem", 5L, 2L, 3L, 0L),
      ("orders", 4L, 2L, 2L, 0L)))
  }

  test("unionEvolve aligns by name and nulls columns missing from a generation") {
    val g1 = Seq((1L, "a")).toDF("id", "x")
    val g2 = Seq((2L, "b", 99L)).toDF("id", "x", "y")
    val out = Snapshot.unionEvolve(Seq(g1, g2)).orderBy("id")
    assert(out.columns.toSeq === Seq("id", "x", "y"))
    val rows = out.collect()
    assert(rows(0).isNullAt(2))
    assert(rows(1).getLong(2) === 99L)
  }
}
