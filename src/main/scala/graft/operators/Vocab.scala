package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

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

  /** Corpus-wide adjacent-character-pair counts, weighted by word
    * frequency — computed over the distinct-word table. */
  def bigramCounts(docs: DataFrame, text: Column = col("text")): DataFrame =
    wordCounts(docs, text)
      .select(col("cnt"), explode(charPairs(col("word"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("pair_cnt"))

  /** Top-k BPE merge candidates: adjacent character pairs ranked by
    * corpus frequency (Σ over words of word_freq × in-word occurrences).
    * Single-character words contribute nothing (empty pair array). */
  def bpeTopMerges(docs: DataFrame, k: Int,
      text: Column = col("text")): DataFrame =
    bigramCounts(docs, text)
      .orderBy(col("pair_cnt").desc, col("pair"))
      .limit(k)

  /** Iterated BPE merge TRAINING (Sennrich et al., ACL 2016) — the
    * actual tokenizer-induction loop, not just the candidate count:
    * per round, count adjacent symbol pairs over the (distinct-word ×
    * frequency) table, pick the global argmax (count desc, pair text as
    * tiebreak), fuse it everywhere, repeat. Returns the merge table
    * (round, pair, merged, support) — the artifact a tokenizer ships.
    *
    * Merging uses plain space-delimited substring replace — scan left
    * to right, continue AFTER each replacement — which both engines
    * implement identically, so the whole k-round training run
    * hash-matches. (Textbook BPE merges a CONSECUTIVE run of the same
    * pair in one round via regex lookbehind; RE2 has none, so runs
    * merge progressively across rounds instead — deterministic, and
    * pinned by spec.) The per-round argmax is ONE collected row — the
    * k-means-style global decision a driver loop legitimately owns;
    * everything else stays distributed (explode + sum at symbol-pair
    * grain over the DISTINCT-WORD table, which is vocabulary-sized,
    * not corpus-sized — the standard BPE-training working set).
    * Replace rounds CHAIN as narrow string expressions on the one
    * materialized w0 — a replace is shuffle-free, so re-evaluating a
    * few of them per scan is cheaper than a materialization job per
    * round; the chain re-materializes every 4 merges so the recompute
    * stays O(1) per round at tokenizer-scale merge counts (thousands)
    * without paying a checkpoint per round at gate scale. */
  def bpeTrain(
      spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      rounds: Int, text: Column = col("text")): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    var words = wordCounts(docs, text)
      .filter(col("word") =!= "")
      .select(concat_ws(" ",
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as("w"),
        col("cnt"))
      .materializeOnce()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var pendingReplaces = 0
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val withSyms = words.withColumn("syms", split(col("w"), " "))
      val top = withSyms
        .select(col("cnt"), explode(
          when(size(col("syms")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), size(col("syms")) - 2),
              j => concat(element_at(col("syms"), j + 1), lit(" "),
                element_at(col("syms"), j + 2))))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("pair")).limit(1)
        .collect() // ONE row: the round's global merge decision
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val merged = pair.replace(" ", "")
        merges += ((r.toLong, pair, merged, top(0).getLong(1)))
        words = words.select(
          trim(call_function("replace",
            concat(lit(" "), col("w"), lit(" ")),
            lit(s" $pair "), lit(s" $merged "))).as("w"),
          col("cnt"))
        pendingReplaces += 1
        if (pendingReplaces >= 4) { // bound the narrow recompute chain
          words = words.materializeOnce()
          pendingReplaces = 0
        }
      }
      r += 1
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "pair", "merged", "support")
      .orderBy(col("round"))
  }

  /** Adjacent-word collocations ranked by EXACT lift (Church & Hanks'
    * association-ratio collocation extraction, with the log dropped:
    * PMI = log₂ lift is monotone in lift, so the ranking is identical
    * and the score stays one exact division):
    *   lift(l,r) = c_lr·N / (c_l·c_r)
    * over the adjacent-pair table, where c_l/c_r are the pair-table
    * margins and N the total pair count — every operand an exact
    * integer, the division the only float op (CLAUDE.md rule 17), so
    * the top-k is totally ordered by (lift desc, l, r) and replayable.
    *
    * Scale shape: ONE corpus-sized shuffle (the pair groupBy, after a
    * repartition ahead of the row-amplifying explode — rule 6); the
    * margins and total are vocabulary²-bounded, broadcast back onto the
    * pair table (no second corpus shuffle), and the top-k is
    * TakeOrdered. Products accumulate as DECIMAL(38,0) (rule 18); the
    * DOUBLE casts are exact while c_lr·N < 2^53. */
  def collocations(docs: DataFrame, k: Int, id: Column = col("doc_id"),
      text: Column = col("text")): DataFrame = {
    val pc = docs
      .repartition(id) // row-amplifying explode (rule 6)
      .select(graft.functions.TextFunctions.tokens(text).as("t"))
      .select(explode(
        when(size(col("t")) < 2, // rule 16: sequence(1,0) counts DOWN
          array().cast("array<struct<l:string,r:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("t")) - 2),
            j => struct(element_at(col("t"), j + 1).as("l"),
              element_at(col("t"), j + 2).as("r"))))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
      .filter(col("l") =!= "" && col("r") =!= "")
      .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c_xy"))
      .materializeOnce() // feeds both margins, the total, and the join
    val lm = pc.groupBy(col("l")).agg(sum(col("c_xy")).as("c_l"))
    val rm = pc.groupBy(col("r")).agg(sum(col("c_xy")).as("c_r"))
    val tot = pc.agg(sum(col("c_xy")).as("n")) // 1-row normalizer
    def D(c: Column) = c.cast("decimal(38,0)")
    pc.join(broadcast(lm), Seq("l")).join(broadcast(rm), Seq("r"))
      .crossJoin(broadcast(tot))
      .select(col("l"), col("r"), col("c_xy"), col("c_l"), col("c_r"),
        ((D(col("c_xy")) * D(col("n"))).cast("double")
          / (D(col("c_l")) * D(col("c_r"))).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("l"), col("r")).limit(k)
  }

  /** BPE ENCODE: apply a trained merge table (in merge order) to every
    * document and report per-doc token statistics — the other half of
    * the tokenizer loop [[bpeTrain]] starts. The merge list is the
    * collected training artifact (merge-count rows — the thing a
    * tokenizer SHIPS, like k-means centroids), folded into a chain of
    * narrow padded-replace expressions over the exploded word table:
    * zero extra shuffles beyond the per-doc aggregate, and the replace
    * semantics are byte-identical to training's, so encoding the
    * training corpus reproduces the final training state (pinned by
    * spec). compression = chars/tokens is one exact int÷int division
    * (CLAUDE.md rule 17). */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    val words = docs
      .repartition(id) // row-amplifying explode (rule 6)
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .filter(col("word") =!= "")
    val spaced = concat_ws(" ",
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))))
    val encoded = merges.foldLeft(spaced) { case (c, (pair, merged)) =>
      trim(call_function("replace", concat(lit(" "), c, lit(" ")),
        lit(s" $pair "), lit(s" $merged ")))
    }
    words
      .select(col("doc_id"), length(col("word")).cast("long").as("chars"),
        size(split(encoded, " ")).cast("long").as("toks"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("chars")).as("n_chars"),
        sum(col("toks")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_tokens"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("compression"))
      .orderBy(col("doc_id"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the word co-occurrence graph — nodes are corpus
    * words, edges are DISTINCT unordered adjacent-word pairs, ranks
    * come from [[Dedup.pageRank]]'s integer fixed-point iteration (the
    * q148 machinery re-targeted from the near-dup doc graph to a word
    * graph), so the whole extraction hash-matches: the oracle replays
    * the identical floor-arithmetic rounds.
    *
    * Scale shape: one corpus explode to the distinct pair set (the
    * only corpus-sized shuffle); the graph itself is vocabulary-
    * bounded, so every PR iteration runs on vocabulary-sized frames.
    * Node ids are `monotonically_increasing_id` (per-partition offsets
    * — unique by construction, no global sort, no collision risk),
    * frozen by the materialization before reuse; a web-scale vocabulary
    * (10⁷–10⁸ types) therefore never funnels through one partition the
    * way a `row_number().over(Window.orderBy(...))` id would (the r9
    * single-partition WindowExec defect). PageRank's integer fixed
    * point never reads id VALUES — contributions, degrees and the final
    * (word, pr) output are id-invariant — so the oracle replays with
    * its own dense ids and still hash-matches. Word→id join sizing is
    * left to AQE (no forced broadcast: at web scale the map is
    * multi-GB and must shuffle; at gate scale AQE broadcasts it). */
  def textRank(docs: DataFrame, k: Int = 20, iters: Int = 3,
      text: Column = col("text")): DataFrame = {
    val pairs = docs
      .repartition(col("doc_id")) // row-amplifying explode (rule 6)
      .select(graft.functions.TextFunctions.tokens(text).as("t"))
      .select(explode(
        when(size(col("t")) < 2, // rule 16 guard
          array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(0), size(col("t")) - 2),
            j => struct(element_at(col("t"), j + 1).as("a"),
              element_at(col("t"), j + 2).as("b"))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= "" && col("b") =!= "" && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("wa"),
        greatest(col("a"), col("b")).as("wb"))
      .distinct()
      .materializeOnce() // feeds the node set AND both id joins
    val nodes = pairs.select(col("wa").as("w"))
      .union(pairs.select(col("wb"))).distinct()
    val voc = nodes
      .withColumn("id", monotonically_increasing_id())
      // freeze the (nondeterministic) ids BEFORE the two joins + the
      // readback — without this each consumer could recompute different
      // ids; vocabulary-sized. materializeCut, not materializeOnce:
      // only a lineage CUT makes the freeze unconditional — under the
      // persist strategy a lost DISK_ONLY_2 block would recompute
      // FRESH ids and silently corrupt the edge joins
      .materializeCut()
    val edges = pairs
      .join(voc.select(col("w").as("wa"), col("id").as("id_a")), Seq("wa"))
      .join(voc.select(col("w").as("wb"), col("id").as("id_b")), Seq("wb"))
      .select(col("id_a"), col("id_b"))
    Dedup.pageRank(edges, iters)
      .join(voc, col("doc_id") === col("id"))
      .select(col("w").as("word"), col("pr"))
      .orderBy(col("pr").desc, col("word")).limit(k)
  }

  /** Cavnar–Trenkle rank-profile language ID ("N-Gram-Based Text
    * Categorization", SDAIR 1994) — the trained counterpart to the
    * t32 heuristic: per language, the top-N character bigrams ranked by
    * frequency form the profile; a document is classified to the
    * profile minimizing the OUT-OF-PLACE distance Σ |doc_rank −
    * lang_rank| (missing bigram ⇒ penalty N). Every quantity is an
    * integer (counts, ranks, |diffs|) and every rank window carries a
    * (count desc, bigram) total tiebreak, so the whole classifier —
    * training AND inference — hash-matches across engines. Output is
    * the (truth, predicted) confusion table.
    *
    * Scale shape: ONE corpus-sized explode feeds both the language
    * profiles and the per-doc profiles (materialized once). Language
    * profiles are |langs|·N rows — broadcast; the doc×candidate grid is
    * docs·|langs| (output-sized per doc). The per-language rank window
    * partitions by lang over bigram-vocabulary-sized frames (≤
    * alphabet²), never corpus rows; the per-doc window partitions by
    * doc. */
  def ctLangConfusion(docs: DataFrame, topN: Int = 20,
      id: Column = col("doc_id"), truth: Column = col("lang"),
      text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .repartition(id) // row-amplifying double explode (rule 6)
      .select(id.as("doc_id"), truth.as("truth"),
        explode(graft.functions.TextFunctions.tokens(text)).as("word"))
      .select(col("doc_id"), col("truth"),
        explode(charPairs(col("word"))).as("bg"))
      .materializeOnce() // feeds lang profiles AND doc profiles
    val wLang = Window.partitionBy(col("cand"))
      .orderBy(col("c").desc, col("bg"))
    val langProf = base.groupBy(col("truth").as("cand"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .withColumn("lr", row_number().over(wLang).cast("long"))
      .filter(col("lr") <= topN)
      .select(col("cand"), col("bg"), col("lr"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("bg"))
    val docProf = base.groupBy(col("doc_id"), col("truth"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dr", row_number().over(wDoc).cast("long"))
      .filter(col("dr") <= topN)
      .select(col("doc_id"), col("truth"), col("bg"), col("dr"))
    val langs = langProf.select(col("cand")).distinct()
    val wPick = Window.partitionBy(col("doc_id"))
      .orderBy(col("dist"), col("cand"))
    docProf.crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("cand", "bg"), "left")
      .groupBy(col("doc_id"), col("truth"), col("cand"))
      .agg(sum(coalesce(abs(col("dr") - col("lr")), lit(topN.toLong)))
        .as("dist"))
      .withColumn("pick", row_number().over(wPick))
      .filter(col("pick") === 1)
      .groupBy(col("truth"), col("cand").as("pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("truth"), col("pred"))
  }

  /** Character-bigram familiarity: per document, the mean corpus
    * frequency of its char bigrams (with multiplicity) — a cheap
    * fluency/noise proxy: garbled or non-language text is built from
    * rare character transitions and scores low.
    *
    * The corpus model is [[bigramCounts]] (distinct-word weighted, so
    * building it is sublinear in corpus size); its vocabulary is tiny
    * (≤ alphabet², and in practice a few thousand pairs), so the
    * per-document join is a broadcast. familiarity = Σcnt / n is an
    * exact-int division. Documents with no bigram (all 1-char tokens)
    * are reported with familiarity 0 rather than dropped. */
  def bigramFamiliarity(docs: DataFrame, id: Column = col("doc_id"),
      text: Column = col("text")): DataFrame = {
    val model = broadcast(bigramCounts(docs, text))
    val docPairs = docs
      .repartition(id) // row-amplifying double explode (rule 6)
      .select(id.as("doc_id"), explode(
        graft.functions.TextFunctions.tokens(text)).as("word"))
      .select(col("doc_id"), explode(charPairs(col("word"))).as("pair"))
    docs.select(id.as("doc_id"))
      .join(
        docPairs.join(model, Seq("pair"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("pair_cnt")).as("sum_cnt")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_cnt").cast("double")
          / col("n_bigrams").cast("double"), lit(0.0)).as("familiarity"))
      .orderBy(col("doc_id"))
  }

  /** Integer bigram surprisal (t86) — the CCNet/perplexity-proxy
    * quality filter (Wenzek et al., LREC 2020) with the language model
    * integerized so both engines replay it bit-for-bit: for each
    * adjacent token pair (prev, cur), the surprisal proxy is
    * ⌊log₂ c(prev)⌋ − ⌊log₂ c(prev,cur)⌋ bits (≥ 0, since a bigram
    * count can't exceed its prefix unigram count), with ⌊log₂⌋ as
    * length(bin(n))−1 — the m63 idiom, exact integers, no libm. A
    * document made of common transitions scores near 0 bits/bigram;
    * garbled or boilerplate-spliced text scores high — the same signal
    * a KenLM perplexity filter thresholds, minus the float model.
    *
    * Scale shape: one token explode (corpus-grain, repartitioned per
    * rule 6, materialized once — it feeds the unigram model AND the
    * pair stream, rule 5); the pair stream derives from a lag window
    * partitioned BY DOCUMENT (bounded partitions — rule 23 does not
    * apply); the unigram/bigram models are vocabulary-bounded
    * aggregates joined back by key. No global window, no driver loop. */
  def surprisal(docs: DataFrame, id: Column = col("doc_id"),
      text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .repartition(id) // row-amplifying explode (rule 6)
      .select(id.as("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(text))
          .as(Seq("pos", "w")))
      .materializeOnce() // feeds the unigram model AND the pair stream
    // unigram model unhinted, like the bigram join below: distinct-token
    // counts reach 10^8–10^9 rows at corpus scale, so a forced broadcast
    // would OOM the driver — AQE broadcasts it while it is small
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pairs = toks
      .withColumn("prev", lag(col("w"), 1).over(byDoc))
      .filter(col("prev").isNotNull)
      .select(col("doc_id"), col("prev"), col("w").as("cur"))
      .materializeOnce() // feeds the bigram model AND the per-doc score
    // bigram model unhinted: vocabulary² — bounded, AQE broadcasts it
    // while small; at corpus scale it stays a key-equi shuffle join
    val bi = pairs.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c2"))
    def lg2(c: Column): Column = length(bin(c)) - lit(1)
    val perDoc = pairs
      .join(bi, Seq("prev", "cur"))
      .join(uni.select(col("w").as("prev"), col("c1")), Seq("prev"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum((lg2(col("c1")) - lg2(col("c2"))).cast("long")).as("sum_bits"))
    docs.select(id.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bits"), lit(0L)).cast("bigint")
          .as("surprisal_bits"),
        coalesce(col("sum_bits").cast("double")
          / col("n_bigrams").cast("double"), lit(0.0)).as("bits_per_bigram"))
      .orderBy(col("doc_id"))
  }

  /** Out-of-vocabulary rate per document against the corpus' own top-k
    * word vocabulary — the tokenizer-coverage / domain-shift signal a
    * vocab build is validated with (a corpus whose docs are mostly OOV
    * against its own head vocabulary is heterogeneous or noisy).
    *
    * Scale shape: the token explode repartitions first (rule 6) and
    * materializes once — it feeds BOTH the vocabulary count and the
    * per-document probe (rule 5). The vocabulary itself is top-k via
    * orderBy+limit (TakeOrdered: per-partition partial top-k, never a
    * global sort) with a (count desc, word) tiebreak so the SAME k
    * words are chosen on every run, then broadcast into a left join —
    * the corpus side never shuffles for it. */
  /** Zipf rank-frequency curve in count-of-counts form: one row per
    * DISTINCT word frequency, carrying how many word types share it,
    * the rank interval those types occupy (ties share an interval —
    * rank_lo = 1 + #types that are strictly more frequent), and the
    * token mass the class accounts for. This is the full log-log Zipf
    * plot without ever ranking individual words: the window that
    * assigns rank intervals runs over the count-of-counts table, whose
    * size is bounded by the number of DISTINCT frequencies —
    * O(√(2·tokens)) worst case, the same argument as keySkew's Gini —
    * so the single-partition window is output-sized at any corpus
    * size. All integer; mass = freq·n_types ≤ total tokens, no
    * overflow below 2^63 tokens. */
  def zipfCurve(docs: DataFrame, text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = docs
      .select(explode(graft.functions.TextFunctions.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val cc = wc.groupBy(col("freq")).agg(count(lit(1)).as("n_types"))
    val prior = Window.orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cc.select(col("freq"), col("n_types"),
        (coalesce(sum(col("n_types")).over(prior), lit(0L)) + lit(1L))
          .as("rank_lo"))
      .select(col("freq"), col("n_types"), col("rank_lo"),
        (col("rank_lo") + col("n_types") - lit(1L)).as("rank_hi"),
        (col("freq") * col("n_types")).as("mass"))
      .orderBy(col("rank_lo"))
  }

  /** Vocabulary-growth (Heaps'-law) curve: cumulative distinct word
    * types vs cumulative tokens, in doc_id ingest order, sampled once
    * per `bucket` consecutive doc ids. The curve is THE diagnostic for
    * "is this crawl still contributing new vocabulary" and the empirical
    * check behind Heaps' V(n) ≈ K·n^β.
    *
    * Scale shape: the corpus-sized work is two keyed aggregations — the
    * per-bucket token count, and per-type FIRST occurrence (a min over
    * the inverted index, the same shuffle d50's novelty pays). A type's
    * first occurrence is the ONLY event that moves the distinct-type
    * curve, so the cumulative window never sees corpus rows: it runs
    * over the per-bucket frame, whose row count is the CURVE's
    * resolution. Pick `bucket` so corpus/bucket is plot-sized (~10³
    * points) and the single-partition window cost is output-sized at
    * any corpus size; the window sums int64 (sum-of-counts ≤ corpus
    * tokens, no overflow below 2^63 tokens). */
  def vocabGrowth(docs: DataFrame, bucket: Long = 50L,
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.repartition(id)
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("w"))
      .filter(length(col("w")) > 0)
      .materializeOnce() // feeds the bucket counts AND first occurrences
    val toksPerBucket = words
      .groupBy(expr(s"doc_id DIV $bucket").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val newTypes = words.groupBy(col("w")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc DIV $bucket").as("bucket"))
      .agg(count(lit(1)).as("n_new_types"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toksPerBucket.join(newTypes, Seq("bucket"), "left")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
      .select(col("bucket"), col("n_tokens"), col("n_new_types"),
        sum(col("n_tokens")).over(cum).as("tokens_cum"),
        sum(col("n_new_types")).over(cum).as("types_cum"))
      .select(col("bucket"), col("n_tokens"), col("n_new_types"),
        col("tokens_cum"), col("types_cum"),
        (col("types_cum").cast("double") / col("tokens_cum").cast("double"))
          .as("ttr"))
      .orderBy(col("bucket"))
  }

  def oovRate(docs: DataFrame, vocabSize: Int,
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    val toks = docs.repartition(id)
      .select(id.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("w"))
      .materializeOnce()
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(vocabSize)
      .select(col("w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }
}
