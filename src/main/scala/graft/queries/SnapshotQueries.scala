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

  val all: Seq[Q] = Seq(

    // CDC latest-wins merge: one arg_max-reduced change per key applied
    // to the base snapshot by a single full-outer equi-join.
    Q("q99_cdc_merge", Some(
      """WITH latest AS (
        |  SELECT user_id AS id,
        |         arg_max(struct_pack(
        |           op := CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END,
        |           val := value), event_id) AS ch
        |  FROM events GROUP BY user_id),
        |b AS (SELECT s_suppkey AS id, CAST(s_acctbal AS DOUBLE) AS val
        |      FROM supplier)
        |SELECT COALESCE(b.id, l.id) AS id,
        |       COALESCE(l.ch.val, b.val) AS val,
        |       CASE WHEN l.id IS NULL THEN 'base' ELSE 'upsert' END AS row_src
        |FROM b FULL OUTER JOIN latest l ON b.id = l.id
        |WHERE l.id IS NULL OR l.ch.op <> 'D'
        |ORDER BY id""".stripMargin),
      (s, d) => {
        val base = T(s, d, "supplier")
          .select(col("s_suppkey").as("id"),
            col("s_acctbal").cast("double").as("val"))
        val changes = T(s, d, "events")
          .select(col("user_id").as("id"),
            when(col("event_type") === "error", "D").otherwise("U").as("op"),
            col("value").as("val"), col("event_id"))
        Snapshot.cdcMerge(base, changes, key = "id", op = "op", seq = "event_id")
          .orderBy(col("id"))
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
      })
  )
}
