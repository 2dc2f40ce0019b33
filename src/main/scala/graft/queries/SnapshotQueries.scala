package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Snapshot

/** Snapshot-maintenance operators (operators/Snapshot.scala) under the
  * oracle gate. The events table doubles as a CDC change log: event_id
  * is the monotone change sequence (LSN), user_id the entity key,
  * event_type 'error' plays the delete tombstone, and `value` the
  * payload column image. The supplier table is the base snapshot —
  * its key range (0..99 at sf0.01) is a strict subset of the log's
  * user range (0..149), so the gate exercises all four merge paths:
  * update, insert, delete, and untouched-base.
  */
object SnapshotQueries {

  private def T(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.load(s, d, n)

  /** Shared oracle fragments: one definition of the change-log
    * reduction and the base snapshot, reused by q99 (batch merge),
    * q107 (streaming merge — same final state), and q108 (diff of the
    * merge against its base), so the three gates cannot drift. */
  private def mergeCtesWhere(logWhere: String): String =
    s"""latest AS (
       |  SELECT user_id AS id,
       |         arg_max(struct_pack(
       |           op := CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END,
       |           val := value), event_id) AS ch
       |  FROM events $logWhere GROUP BY user_id),
       |b AS (SELECT s_suppkey AS id, CAST(s_acctbal AS DOUBLE) AS val
       |      FROM supplier)""".stripMargin
  private val mergeCtes = mergeCtesWhere("")

  /** The merged snapshot rows (id, val) from those CTEs. */
  private val mergedSelect =
    """SELECT COALESCE(b.id, l.id) AS id,
      |       COALESCE(l.ch.val, b.val) AS val
      |FROM b FULL OUTER JOIN latest l ON b.id = l.id
      |WHERE l.id IS NULL OR l.ch.op <> 'D'""".stripMargin

  /** Spark-side base snapshot + change log, shared by q99/q107/q108. */
  private def baseSnapshot(s: org.apache.spark.sql.SparkSession, d: String) =
    T(s, d, "supplier").select(col("s_suppkey").as("id"),
      col("s_acctbal").cast("double").as("val"))
  private def changeLog(s: org.apache.spark.sql.SparkSession, d: String) =
    T(s, d, "events").select(col("user_id").as("id"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("value").as("val"), col("event_id"))

  val all: Seq[Q] = Seq(

    // CDC latest-wins merge: one arg_max-reduced change per key applied
    // to the base snapshot by a single full-outer equi-join.
    Q("q99_cdc_merge", Some(
      s"""WITH $mergeCtes
         |SELECT COALESCE(b.id, l.id) AS id,
         |       COALESCE(l.ch.val, b.val) AS val,
         |       CASE WHEN l.id IS NULL THEN 'base' ELSE 'upsert' END AS row_src
         |FROM b FULL OUTER JOIN latest l ON b.id = l.id
         |WHERE l.id IS NULL OR l.ch.op <> 'D'
         |ORDER BY id""".stripMargin),
      (s, d) => Snapshot.cdcMerge(baseSnapshot(s, d), changeLog(s, d),
          key = "id", op = "op", seq = "event_id")
        .orderBy(col("id"))),

    // the SAME merge maintained incrementally by a STREAM: the change
    // log arrives as three LSN-ordered micro-batches, foreachBatch
    // folds each into a versioned snapshot, and the final snapshot must
    // equal the one-shot batch merge — so the oracle IS the batch-merge
    // SQL. Stream/batch parity for mutation, not just aggregation.
    Q("q107_stream_cdc_upsert", Some(
      s"""WITH $mergeCtes
         |$mergedSelect
         |ORDER BY id""".stripMargin),
      (s, d) => {
        val chunks = graft.streaming.EventPipeline.cdcChunksDir(s, d)
        val snapRoot = Staging.sinkDir(
          "cdc_" + d.replaceAll("[^A-Za-z0-9]", "_"))
        val q = graft.streaming.EventPipeline.startCdcUpsertQuery(
          s, chunks, snapRoot, baseSnapshot(s, d))
        try q.processAllAvailable() finally q.stop()
        val snaps = Option(new java.io.File(snapRoot).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.startsWith("snap_"))
          .sortBy(f => f.getName.stripPrefix("snap_").toInt)
        require(snaps.nonEmpty,
          s"q107: CDC stream produced no snap_* dirs under $snapRoot")
        s.read.parquet(snaps.last.getAbsolutePath).orderBy(col("id"))
      }),

    // time travel: the snapshot AS OF change-sequence 5000 — the merge
    // replays only the log prefix (a pushable filter; at 100 TB a
    // partition-pruned read of an LSN-partitioned log). Same oracle
    // CTEs with the prefix predicate injected, so the two gates share
    // one merge definition.
    Q("q131_time_travel", Some(
      s"""WITH ${mergeCtesWhere("WHERE event_id <= 5000")}
         |SELECT COALESCE(b.id, l.id) AS id,
         |       COALESCE(l.ch.val, b.val) AS val,
         |       CASE WHEN l.id IS NULL THEN 'base' ELSE 'upsert' END AS row_src
         |FROM b FULL OUTER JOIN latest l ON b.id = l.id
         |WHERE l.id IS NULL OR l.ch.op <> 'D'
         |ORDER BY id""".stripMargin),
      (s, d) => Snapshot.asOf(baseSnapshot(s, d), changeLog(s, d),
          key = "id", op = "op", seq = "event_id", upTo = 5000L)
        .orderBy(col("id"))),

    // row-level diff of the merged snapshot against its base: what did
    // the merge actually do to every key.
    Q("q108_snapshot_diff", Some(
      s"""WITH $mergeCtes,
         |m AS ($mergedSelect)
         |SELECT COALESCE(b.id, m.id) AS id,
         |       CASE WHEN b.id IS NULL THEN 'added'
         |            WHEN m.id IS NULL THEN 'removed'
         |            WHEN b.val IS DISTINCT FROM m.val THEN 'changed'
         |            ELSE 'unchanged' END AS status,
         |       b.val AS old_val, m.val AS new_val
         |FROM b FULL OUTER JOIN m ON b.id = m.id
         |ORDER BY id""".stripMargin),
      (s, d) => {
        val base = baseSnapshot(s, d)
        val merged = Snapshot.cdcMerge(base, changeLog(s, d),
            key = "id", op = "op", seq = "event_id")
          .select(col("id"), col("val"))
        Snapshot.snapshotDiff(base, merged, "id").orderBy(col("id"))
      }),

    // SCD2 history: every change becomes a versioned validity interval;
    // event time floored to seconds (cross-engine granularity), version
    // order (floored ts, event_id) total on both engines.
    Q("q100_scd2_history", Some(
      """SELECT user_id, version, valid_from, valid_to, value
        |FROM (
        |  SELECT user_id, event_id, value,
        |         date_trunc('second', ts) AS valid_from,
        |         lead(date_trunc('second', ts)) OVER w AS valid_to,
        |         CAST(row_number() OVER w AS BIGINT) AS version
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY date_trunc('second', ts), event_id))
        |ORDER BY user_id, version""".stripMargin),
      (s, d) => Snapshot.scd2History(
          T(s, d, "events"), key = "user_id", ts = "ts", seq = "event_id")
        .select(col("user_id"), col("version"), col("valid_from"),
          col("valid_to"), col("value"))
        .orderBy(col("user_id"), col("version"))),

    // Schema-evolution union: generation 2 added n_chars; rows from
    // generation 1 surface it as NULL under union-by-NAME alignment.
    Q("q101_union_evolve", Some(
      """SELECT doc_id, lang, source, CAST(NULL AS BIGINT) AS n_chars
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val docs = T(s, d, "documents")
        val gen1 = docs.select(col("doc_id"), col("lang"), col("source"))
        val gen2 = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          col("lang"), col("source"), col("n_chars"))
        Snapshot.unionEvolve(Seq(gen1, gen2)).orderBy(col("doc_id"))
      }),

    // right-to-be-forgotten cascade audit (q195): size the referential
    // delete cascade customer → orders → lineitem under a replayable
    // root predicate and PROVE closure — orphan counts are computed
    // (orders directly; lineitem via its surviving parent order, a
    // two-hop recheck), not assumed. All exact int64 counts.
    Q("q195_delete_cascade", Some(
      """WITH delc AS (SELECT c_custkey FROM customer
        |              WHERE c_custkey % 17 = 0),
        |delo AS (SELECT o_orderkey FROM orders
        |         WHERE o_custkey IN (SELECT c_custkey FROM delc)),
        |survo AS (SELECT * FROM orders
        |          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delo)),
        |survl AS (SELECT l_orderkey FROM lineitem
        |          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM delo))
        |SELECT 'customer' AS table_name,
        |       (SELECT count(*) FROM customer) AS rows_before,
        |       (SELECT count(*) FROM delc) AS rows_removed,
        |       (SELECT count(*) FROM customer)
        |         - (SELECT count(*) FROM delc) AS rows_after,
        |       CAST(0 AS BIGINT) AS orphans_after
        |UNION ALL
        |SELECT 'lineitem', (SELECT count(*) FROM lineitem),
        |       (SELECT count(*) FROM lineitem
        |        WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
        |       (SELECT count(*) FROM lineitem)
        |         - (SELECT count(*) FROM lineitem
        |            WHERE l_orderkey IN (SELECT o_orderkey FROM delo)),
        |       (SELECT count(*) FROM survl l
        |        JOIN orders o ON l.l_orderkey = o.o_orderkey
        |        WHERE o.o_custkey IN (SELECT c_custkey FROM delc))
        |UNION ALL
        |SELECT 'orders', (SELECT count(*) FROM orders),
        |       (SELECT count(*) FROM delo),
        |       (SELECT count(*) FROM orders)
        |         - (SELECT count(*) FROM delo),
        |       (SELECT count(*) FROM survo
        |        WHERE o_custkey IN (SELECT c_custkey FROM delc))
        |ORDER BY table_name""".stripMargin),
      (s, d) => Snapshot.deleteCascadeAudit(
        T(s, d, "customer"), T(s, d, "orders"), T(s, d, "lineitem"),
        rootPred = col("c_custkey") % 17 === 0))
  )
}
