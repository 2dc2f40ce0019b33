package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed vocabulary construction — the BPE-training counting step
  * (Sennrich et al., "Neural machine translation of rare words with
  * subword units", ACL 2016) expressed as aggregates.
  *
  * The 100 TB shape: adjacent-pair counting is NOT run over the corpus
  * rows. The corpus first reduces to the DISTINCT-word frequency table
  * (one explode + one groupBy — the same shuffle any token count pays),
  * and the per-word character bigrams explode off that table weighted
  * by word frequency. Pair statistics cost O(distinct words), which is
  * sublinear in corpus size and shrinks further as merges proceed —
  * exactly why classical BPE trainers work from a word-count dict.
  *
  * Character access is 1-indexed `substring` under a `transform` over
  * `sequence(1, len-1)` — mirrored verbatim in the DuckDB oracle, so
  * both engines enumerate identical pairs. Counts are int64 sums: no
  * doubles anywhere.
  */
object Vocab {

  /** (word, cnt) frequency table of whitespace tokens. */
  def wordCounts(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Adjacent character pairs of `w` as an array of 2-char strings.
    * Guarded for len<2: Spark's sequence(1, 0) counts DOWN ([1,0]) —
    * it does not produce the empty array DuckDB's range(1,1) does. */
  private def charPairs(w: Column): Column =
    when(length(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(w) - 1),
        i => w.substr(i, lit(2))))

  /** Top-k BPE merge candidates: adjacent character pairs ranked by
    * corpus frequency (Σ over words of word_freq × in-word occurrences).
    * Single-character words contribute nothing (empty pair array). */
  def bpeTopMerges(docs: DataFrame, k: Int,
      text: Column = col("text")): DataFrame = {
    val wc = wordCounts(docs, text)
    wc.select(col("cnt"), explode(charPairs(col("word"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("pair_cnt"))
      .orderBy(col("pair_cnt").desc, col("pair"))
      .limit(k)
  }
}
