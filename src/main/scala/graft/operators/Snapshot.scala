package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance — the operators a 100 TB corpus needs to stay
  * *current*: applying a keyed change log to a base snapshot (CDC
  * upsert/delete merge), building slowly-changing-dimension history
  * (SCD type 2 validity intervals), and unioning snapshot generations
  * whose schemas have evolved.
  *
  * The reference engine has no mutation surface (its tables are
  * immutable in-memory frames, reference: dfsql/table.py); these are
  * extension operators shaped for incremental pipelines, where the
  * change log is orders of magnitude smaller than the snapshot it
  * amends.
  */
object Snapshot {

  /** Latest-wins CDC merge: apply a change log of upserts ('U') and
    * delete tombstones ('D') to a base snapshot, both keyed by `key`.
    *
    * The log is first reduced to one winning change per key with
    * `max_by` over the monotone change-sequence column `seq` (a CDC
    * LSN; `event_id` in the gate query) — an ordinary aggregate, so it
    * gets map-side partial aggregation and never sorts, unlike a
    * row_number window. With `seq` unique the winner is deterministic
    * under any shuffle schedule. The merge itself is ONE full-outer
    * equi-join on the key:
    *   - key only in base            -> base row survives  (row_src 'base')
    *   - winning change is an upsert -> change payload wins (row_src 'upsert';
    *                                    covers both updates and inserts)
    *   - winning change is a delete  -> key dropped
    *
    * 100 TB shape: the aggregate shuffles only the (small) log; the
    * join is co-partitioned on the key — against a bucketed base it is
    * shuffle-free on the snapshot side, and the log side can broadcast
    * when it fits. Payload columns are everything in `base` except the
    * key; the log must carry the same payload columns. A null payload
    * in the winning upsert falls back to the base value (partial-update
    * semantics, the usual CDC-column-image contract). */
  def cdcMerge(
      base: DataFrame, changes: DataFrame,
      key: String, op: String, seq: String): DataFrame = {
    val payload = base.columns.filter(_ != key).toSeq
    require(payload.nonEmpty, "cdcMerge needs at least one payload column")
    val picked = Seq(col(op).as("__op")) ++ payload.map(c => col(c))
    val latest = changes
      .groupBy(col(key))
      .agg(max_by(struct(picked: _*), col(seq)).as("__ch"))
      .select(col(key) +: col("__ch.__op").as("__op") +:
        payload.map(c => col(s"__ch.$c").as(s"__ch_$c")): _*)
    base.join(latest, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +:
        payload.map(c => coalesce(col(s"__ch_$c"), col(c)).as(c)) :+
        when(col("__op").isNull, lit("base")).otherwise(lit("upsert"))
          .as("row_src"): _*)
  }

  /** SCD type-2 history: each change row becomes a version with a
    * validity interval [valid_from, valid_to), valid_to = the next
    * version's valid_from, null while current. Event time is floored
    * to whole seconds (cross-engine-safe granularity); ordering within
    * a key is (floored time, seq) so the version chain is total and
    * deterministic on both engines regardless of sub-second precision.
    *
    * 100 TB shape: one window partitioned by the entity key — per-key
    * history is bounded (an entity's change count), so partitions stay
    * small no matter how large the corpus; there is no global sort. */
  def scd2History(
      changes: DataFrame, key: String, ts: String, seq: String): DataFrame = {
    val vf = date_trunc("second", col(ts))
    val w = Window.partitionBy(col(key)).orderBy(vf, col(seq))
    changes
      .withColumn("valid_from", vf)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      // long, not int: no non-int64 integer in a final oracled schema
      .withColumn("version", row_number().over(w).cast("long"))
  }

  /** Row-level diff of two snapshot generations sharing a key and
    * payload schema: one full-outer equi-join classifying every key as
    * added / removed / changed / unchanged (changed = any payload
    * column differs; null-safe compare). The drift-detection companion
    * to cdcMerge — at 100 TB this is how a pipeline audits what an
    * incremental merge actually did, without replaying history. */
  def snapshotDiff(
      oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    val payload = oldSnap.columns.filter(_ != key).toSeq
    require(payload == newSnap.columns.filter(_ != key).toSeq,
      "snapshotDiff needs identical payload columns")
    val o = oldSnap.select(col(key) +: lit(true).as("__in_old") +:
      payload.map(c => col(c).as(s"old_$c")): _*)
    val n = newSnap.select(col(key) +: lit(true).as("__in_new") +:
      payload.map(c => col(c).as(s"new_$c")): _*)
    val changed = payload.map(c =>
      !(col(s"old_$c") <=> col(s"new_$c"))).reduce(_ || _)
    o.join(n, Seq(key), "full_outer")
      .select(col(key) +:
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")).as("status") +:
        payload.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }

  /** Union snapshot generations with evolved schemas: columns are
    * aligned by NAME, and columns missing from a generation surface as
    * nulls (`unionByName(allowMissingColumns)`) — the schema-evolution
    * contract of long-lived parquet corpora, where position-based UNION
    * would silently misalign. Output column order: the first
    * generation's columns, then new columns in first-seen order. */
  /** Right-to-be-forgotten cascade audit: given a root deletion
    * predicate on the customer table, size the referential cascade
    * (customer → orders by o_custkey → lineitem by l_orderkey) and
    * PROVE closure — per table: rows before / removed / after, plus
    * the count of SURVIVING rows that still reach a deleted customer
    * (orders directly; lineitem through its surviving parent order —
    * a genuine two-hop recheck, not the deletion rule restated). The
    * orphan counts must come back 0; emitting them computed, not
    * assumed, is the audit.
    *
    * Scale shape: the deletion key set flows through semi/anti joins
    * (never collected, never forced broadcast — a GDPR batch can be
    * millions of keys; AQE picks broadcast when it fits). delC/delO
    * are materialized once each (rule 5: both feed removal counting
    * AND an orphan path). Everything is exact int64 counts. */
  def deleteCascadeAudit(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, rootPred: Column): DataFrame = {
    import graft.operators.Materialize.Ops
    val delC = customer.filter(rootPred).select(col("c_custkey"))
      .materializeOnce()
    val delO = orders
      .join(delC, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).materializeOnce()
    def row(name: String, before: DataFrame, removed: DataFrame,
        orphans: DataFrame): DataFrame =
      before.agg(count(lit(1)).as("b"))
        .crossJoin(removed.agg(count(lit(1)).as("r")))
        .crossJoin(orphans.agg(count(lit(1)).as("o")))
        .select(lit(name).as("table_name"), col("b").as("rows_before"),
          col("r").as("rows_removed"), (col("b") - col("r")).as("rows_after"),
          col("o").as("orphans_after"))
    val custRow = row("customer", customer, delC,
      customer.limit(0)) // the root has no parent to orphan against
    val survO = orders
      .join(delO, orders("o_orderkey") === delO("o_orderkey"), "left_anti")
    val ordRow = row("orders", orders, delO,
      survO.join(delC, col("o_custkey") === col("c_custkey"), "left_semi"))
    val survL = lineitem
      .join(delO, lineitem("l_orderkey") === delO("o_orderkey"), "left_anti")
    val liRemoved = lineitem
      .join(delO, lineitem("l_orderkey") === delO("o_orderkey"), "left_semi")
    val liOrphans = survL.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(delC, col("o_custkey") === col("c_custkey"), "left_semi")
    val liRow = row("lineitem", lineitem, liRemoved, liOrphans)
    custRow.unionByName(liRow).unionByName(ordRow)
      .orderBy(col("table_name"))
  }

  def unionEvolve(generations: Seq[DataFrame]): DataFrame = {
    require(generations.nonEmpty, "unionEvolve needs at least one input")
    generations.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Time travel: the snapshot as of change-sequence `upTo` — replay
    * only the log prefix seq ≤ upTo onto the base. Because the change
    * log is reduced per key by max_by BEFORE the merge join, the
    * filter composes with cdcMerge for free: the predicate is pushable
    * to the log scan (at 100 TB that is a partition-pruned read of an
    * LSN/date-partitioned log), and nothing about the merge changes.
    * Same contract as table-format time travel (Iceberg/Delta "VERSION
    * AS OF"), without a manifest: any historical state is a filter. */
  def asOf(base: DataFrame, changes: DataFrame,
      key: String, op: String, seq: String, upTo: Long): DataFrame =
    cdcMerge(base, changes.filter(col(seq) <= upTo), key, op, seq)
}
