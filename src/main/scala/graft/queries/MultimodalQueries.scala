package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column queries: binary payload metadata (oracled — byte
  * length and content hash are portable SQL) and the stubbed decode
  * pipeline (rows-only; the decode is container-stubbed, the plumbing is
  * real and spec-tested).
  */
object MultimodalQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  val all: Seq[Q] = Seq(

    // binary-column metadata: byte length + sha256 of the payload
    Q("m44_media_meta", Some(
      """SELECT doc_id AS media_id,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       sha256(text) AS payload_sha
        |FROM documents ORDER BY media_id""".stripMargin),
      (s, d) => docs(s, d).select(
        col("doc_id").as("media_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        sha2(col("text"), 256).as("payload_sha"))
        .orderBy(col("media_id"))),

    // partition-wise stub decode → feature rows (mapPartitions plumbing)
    Q("m45_media_features", None,
      (s, d) => Multimodal.extractFeatures(s,
        Multimodal.mediaTable(docs(s, d)))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("media_id")))
  )
}
