package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search operators over the embeddings table (64-dim float
  * vectors). The brute-force query is the exactness baseline and is
  * oracled bitwise (sequential-fold cosine on both sides); the LSH / IVF
  * variants are the approximate scale paths (rows-only checks; recall is
  * spec-tested on planted duplicates).
  */
object SimilarityQueries {

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  /** The DuckDB mirror of Similarity.cosine's sequential fold. */
  private def cosSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |  * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  val all: Seq[Q] = Seq(

    // exact cosine top-10 for 5 fixed query vectors — bitwise-oracled
    Q("s41_knn_brute", Some(
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.q_id, e.vec_id, ${cosSql("q.q_emb", "e.embedding")} AS cos
         |  FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT q_id, vec_id, cos, rank FROM ranked WHERE rank <= 10
         |ORDER BY q_id, rank""".stripMargin),
      (s, d) => Similarity.bruteForceKnn(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 10)),

    // multi-probe LSH approximate top-k (deterministic planes, seed 42)
    Q("s42_knn_lsh", None,
      (s, d) => Similarity.annLsh(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 10)),

    // embedding near-dup pairs: LSH bucket join + exact cosine threshold.
    // Oracled against the brute-force O(N²) DuckDB equivalent: candidates
    // found by LSH are a subset, so this also *asserts recall* — any pair
    // the buckets miss fails the hash match. (On this corpus the pair set
    // at 0.95 is empty, making subset == exact set; the mechanism's
    // recall on actual dups is spec-tested with planted vectors.)
    Q("d41_embed_neardup", Some(
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       ${cosSql("a.embedding", "b.embedding")} AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.95
         |ORDER BY id_a, id_b""".stripMargin),
      (s, d) => Similarity.embeddingNearDupes(emb(s, d), threshold = 0.95)),

    // IVF-style coarse-quantized search (centroid probe → cell-local scan)
    Q("s43_knn_ivf", None,
      (s, d) => Similarity.ivfSearch(
        emb(s, d), emb(s, d).filter(col("vec_id") < 5), k = 10, nProbe = 2))
  )
}
