package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines, built entirely from
  * codegen'd Spark SQL functions (no UDFs) so they run inside
  * WholeStageCodegen and scale to 100 TB document tables.
  *
  * Everything here is also expressible in ANSI/DuckDB SQL, which is what
  * the oracled queries in TextQueries mirror.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap proxy for subword tokenizer counts. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Punctuation character count (explicit class, engine-portable). */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,!?;:]"))

  /** Ratio of stopword tokens (tiny fixed list) to all tokens. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it")
  def stopwordRatio(text: Column): Column = {
    val stops = filter(tokens(text),
      w => w.isInCollection(stopwords))
    size(stops).cast("double") / size(tokens(text))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") / tokenCount(text)

  /** Heuristic quality score in [0,1]: rewards mid-length documents with
    * some stopwords and low punctuation density. The exact formula is
    * arbitrary but deterministic and portable — it mirrors the shape of
    * published quality filters (length + symbol ratio + stopword checks).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = least(punctCount(text).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double"), lit(1.0))
    round(lenScore * lit(0.4) + stopScore * lit(0.4) +
      (lit(1.0) - punctPenalty) * lit(0.2), 6)
  }

  /** Vowel-group count of one token — the classic one-pass syllable
    * estimator (each maximal [aeiouy]+ run ≈ one syllable). */
  def vowelGroups(token: Column): Column =
    regexp_count(token, lit("[aeiouyAEIOUY]+"))

  /** Monosyllabic-token count: tokens whose syllable estimate is exactly
    * 1 — the word-difficulty numerator of the FORCAST readability
    * formula (Caylor et al., 1973), the standard readability index that
    * needs NO sentence segmentation (this corpus has none). */
  def monosyllableCount(text: Column): Column =
    size(filter(tokens(text), w => vowelGroups(w) === 1))

  /** Marker-word count: non-overlapping occurrences of ` marker ` in the
    * space-padded text (regex scan semantics are identical in Java regex
    * and RE2, so this is oracle-portable). */
  def markerCount(text: Column, marker: String): Column =
    regexp_count(concat(lit(" "), text, lit(" ")), lit(s" $marker "))
      .cast("bigint")

  /** N-gram-heuristic language ID over a fixed marker table. Returns the
    * language whose marker words appear most often, 'und' when none do.
    * (The synthetic corpus is English-vocab throughout; the mechanism is
    * what matters — swap the marker table for real lexicons.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and"),
    "fr" -> Seq("le", "et"),
    "es" -> Seq("el", "y"),
    "de" -> Seq("der", "und"),
    "zh" -> Seq("de", "he"))
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => markerCount(text, m)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, score)) =>
      acc.when(score === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Exact content fingerprint (md5 hex of the raw text). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonical fingerprint: md5 of the sorted token multiset — equal for
    * word-order permutations of the same bag of words. */
  def canonicalFingerprint(text: Column): Column =
    md5(array_join(array_sort(tokens(text)), " "))

  /** Word n-gram shingles (distinct) from an ALREADY-MATERIALIZED token
    * array column. The token array must be a plain column reference, not
    * an inline split(...): an outer expression referenced inside a
    * higher-order-function lambda is re-evaluated per element, turning
    * shingling O(words) into O(words²) (measured 3× slowdown). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => array_join(slice(toks, i + 1, lit(n)), " ")),
        s => length(s) > 0))

  /** Word n-gram shingles of a text column. Convenience composition —
    * prefer tokenizing into a column first (see shinglesFromTokens). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** POSITIONAL n-token windows (with multiplicity, unlike the distinct
    * shingle set above): window i covers tokens [i, i+n). The substring-
    * dedup family counts how many of a document's windows repeat, so a
    * window occurring three times must appear three times. Same
    * truncating-slice and empty-window semantics as shinglesFromTokens. */
  def windowsFromTokens(toks: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")),
      s => length(s) > 0)

  /** Lexicon word lists for sentimentCounts — tiny and inlined; a real
    * deployment swaps in a published lexicon, the operator shape (set
    * membership over tokens, integer counts, one division) is what the
    * distributed-sentiment line of work (Spark sentiment @ EDBT 2016)
    * actually runs per document. One definition, two engines: the t47
    * oracle interpolates THESE lists into its SQL. */
  val positiveLexicon: Seq[String] = Seq("fast", "big", "merge", "join")
  val negativeLexicon: Seq[String] = Seq("slow", "small", "scan", "skew")

  /** Per-document lexicon sentiment: (n_pos, n_neg, n_tokens) token
    * OCCURRENCE counts — exact integers; the score is the caller's one
    * division (rule 17) so ranking stays bit-reproducible. */
  def positiveCount(text: Column): Column =
    size(filter(tokens(text), t =>
      positiveLexicon.map(t === lit(_)).reduce(_ || _))).cast("bigint")

  def negativeCount(text: Column): Column =
    size(filter(tokens(text), t =>
      negativeLexicon.map(t === lit(_)).reduce(_ || _))).cast("bigint")
}
