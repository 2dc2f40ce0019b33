package graft.operators

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTopMerges counts word-frequency-weighted adjacent char pairs") {
    // "ab ab abc" + "ab" → word counts: ab=3, abc=1
    // pairs: 'ab' from ab(3)+abc(1)=4 ; 'bc' from abc(1)=1
    val docs = Seq("ab ab abc", "ab").toDF("text")
    val out = Vocab.bpeTopMerges(docs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("ab", 4L), ("bc", 1L)))
  }

  test("single-character and empty words contribute no pairs") {
    val docs = Seq("a b c", "").toDF("text")
    assert(Vocab.bpeTopMerges(docs, k = 10).count() === 0L)
  }

  test("within-word repeats count with multiplicity") {
    // 'aaa' has pairs aa, aa → weight 2 per occurrence
    val docs = Seq("aaa aaa").toDF("text")
    val out = Vocab.bpeTopMerges(docs, k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(out === List(("aa", 4L)))
  }

  test("bigramFamiliarity: common transitions score high, rare ones low") {
    // corpus: 'ab' appears in 3 words, 'xq' in 1
    val docs = Seq((0L, "abc abd"), (1L, "abe"), (2L, "xq"), (3L, "a"))
      .toDF("doc_id", "text")
    // model: ab=3, bc=1, bd=1, be=1, xq=1
    val out = Vocab.bigramFamiliarity(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(out(0L) === ((4L, (3 + 1 + 3 + 1) / 4.0))) // ab,bc,ab,bd
    assert(out(1L) === ((2L, (3 + 1) / 2.0)))
    assert(out(2L) === ((1L, 1.0)))   // all-rare doc scores the floor
    assert(out(3L) === ((0L, 0.0)))   // no bigrams at all → reported, 0
  }

  test("vocabGrowth: cumulative types and tokens per doc_id bucket") {
    // bucket 0 (docs 0,1): 5 tokens; first occurrences a@0, b@0, c@1 → 3
    // bucket 1 (doc 50): 2 tokens; new type d → 1
    // doc 100 is empty → filtered; its bucket must not appear
    val docs = Seq((0L, "a b a"), (1L, "b c"), (50L, "c d"), (100L, " "))
      .toDF("doc_id", "text")
    val rows = Vocab.vocabGrowth(docs, bucket = 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toList
    assert(rows === List(
      (0L, 5L, 3L, 5L, 3L, 3.0 / 5.0),
      (1L, 2L, 1L, 7L, 4L, 4.0 / 7.0)))
  }

  test("zipfCurve: tied frequencies share a rank interval") {
    // freqs: a=3, b=2, c=1, d=1 → classes (3,1cnt), (2,1), (1,2 types)
    val docs = Seq("a a a b", "b c d").toDF("text")
    val rows = Vocab.zipfCurve(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(rows === List(
      (3L, 1L, 1L, 1L, 3L),
      (2L, 1L, 2L, 2L, 2L),
      (1L, 2L, 3L, 4L, 2L)))
  }

  test("oovRate scores docs against the deterministic top-k vocabulary") {
    // counts: hot×4, warm×2, cold×1, rare×1 → top-2 = {hot, warm}
    // (cold vs rare would tie at 1; count-desc beats both — the k=2
    // cut is unambiguous, and the word tiebreak governs equal counts)
    val docs = Seq(
      (0L, "hot hot warm"),          // all in vocab → 0/3
      (1L, "hot cold rare"),         // 2 oov of 3
      (2L, "hot hot warm warm cold") // 1 oov of 5
    ).toDF("doc_id", "text")
    val out = Vocab.oovRate(docs, vocabSize = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0L) === ((3L, 0L, 0.0)))
    assert(out(1L) === ((3L, 2L, 2.0 / 3.0)))
    assert(out(2L) === ((5L, 1L, 0.2)))
  }

  test("bpeTrain: argmax merges with exact frequency-weighted support") {
    import spark.implicits._
    // words: aa×2, ab×1 -> round 1 merges ('a a', support 2) -> words
    // become [aa], [a b] -> round 2 merges ('a b', support 1)
    val docs = Seq((0L, "aa ab"), (1L, "aa")).toDF("doc_id", "text")
    val out = Vocab.bpeTrain(spark, docs, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "a a", "aa", 2L), (2L, "a b", "ab", 1L)))
  }

  test("collocations: exact lift over adjacent pairs, margins from the pair table") {
    import spark.implicits._
    // doc0 pairs: (a,b),(b,a),(a,b); doc1: (a,c),(c,b) -> N=5
    // c_l: a=3, b=1, c=1; c_r: b=3, a=1, c=1
    val docs = Seq((0L, "a b a b"), (1L, "a c b")).toDF("doc_id", "text")
    val out = Vocab.collocations(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val m = out.map(t => (t._1, t._2) -> t).toMap
    assert(m(("a", "b")) === (("a", "b", 2L, 3L, 3L, 10.0 / 9.0)))
    assert(m(("b", "a")) === (("b", "a", 1L, 1L, 1L, 5.0)))
    assert(m(("a", "c")) === (("a", "c", 1L, 3L, 1L, 5.0 / 3.0)))
    assert(m(("c", "b")) === (("c", "b", 1L, 1L, 3L, 5.0 / 3.0)))
    // ranking: (b,a) 5.0 first; ties (a,c)/(c,b) broken by l
    assert(out.take(3).map(t => (t._1, t._2)).toSeq ===
      Seq(("b", "a"), ("a", "c"), ("c", "b")))
  }

  test("ctLangConfusion separates disjoint-alphabet languages perfectly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "aaab aaab"), (2L, "x", "aaba baaa"),
      (3L, "y", "ccdd ccdd"), (4L, "y", "cdcd ddcc")
    ).toDF("doc_id", "lang", "text")
    val out = Vocab.ctLangConfusion(docs, topN = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x", "x", 2L), ("y", "y", 2L)))
  }

  test("ctLangConfusion out-of-place distance: absent bigram costs topN") {
    import spark.implicits._
    // lang p profile (topN=2): [ab(x2 r1), bc r2]; lang q: [xy r1, yz r2]
    // probe doc (truth p) 'abab' -> doc profile [ab r1, ba r2]:
    //   dist to p = |1-1| + 2(ba absent) = 2; dist to q = 2 + 2 = 4 -> p
    val docs = Seq(
      (1L, "p", "abc ab"), (2L, "q", "xyz"), (3L, "p", "abab")
    ).toDF("doc_id", "lang", "text")
    val out = Vocab.ctLangConfusion(docs, topN = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq.contains(("p", "p", 2L)))
    assert(out.toSeq.contains(("q", "q", 1L)))
  }

  test("textRank ranks the co-occurrence hub first; scores descend totally") {
    import spark.implicits._
    val docs = Seq((1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"),
      (4L, "alpha beta")).toDF("doc_id", "text")
    val out = Vocab.textRank(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.length === 4) // hub, alpha, beta, gamma
    assert(out.head._1 === "hub")
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
    // duplicate adjacent pair must not double an edge: rerun with a
    // repeated doc -> identical ranks
    val out2 = Vocab.textRank(docs.union(docs), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out2.toSeq === out.toSeq)
  }

  test("bpeEncode applies the trained merges; counts and compression exact") {
    import spark.implicits._
    val docs = Seq((0L, "aa ab"), (1L, "aa")).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(spark, docs, rounds = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Vocab.bpeEncode(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // doc 0: 'aa'->[aa] (1 tok), 'ab'->[ab] (1 tok): 2 words, 4 chars,
    // 2 tokens, compression 2.0; doc 1: 'aa'->[aa]: 1/2/1/2.0
    assert(out.toSeq === Seq(
      (0L, 2L, 4L, 2L, 2.0), (1L, 1L, 2L, 1L, 2.0)))
  }

  test("bpeEncode on the training corpus reproduces the final training state") {
    import spark.implicits._
    // 'aaa' after 2 merge rounds trains to the single symbol 'aaa'
    // (round 1: 'a a'->'aa' left-to-right => 'aa a'; round 2 fuses).
    // Encoding the same corpus with the shipped merges must agree.
    val docs = Seq((0L, "aaa aaa b")).toDF("doc_id", "text")
    val merges = Vocab.bpeTrain(spark, docs, rounds = 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Vocab.bpeEncode(docs, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 3 words, 7 chars, tokens: aaa->1, aaa->1, b->1 = 3
    assert(out.toSeq === Seq((0L, 3L, 7L, 3L)))
  }

  test("bpeTrain pins the plain-replace run semantics (alternating merge)") {
    import spark.implicits._
    // 'aaa': round 1 counts 'a a' twice but the padded replace merges
    // left-to-right non-overlapping -> 'aa a'; round 2 fuses the rest.
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val out = Vocab.bpeTrain(spark, docs, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "a a", "aa", 2L), (2L, "aa a", "aaa", 1L)))
  }

  test("surprisal: hand-computed integer bigram bits") {
    // corpus: d1 = "a b a b", d2 = "a b", d3 = "z q", d4 = "solo"
    // unigrams: a=3, b=3, z=1, q=1, solo=1
    // bigrams:  (a,b)=3, (b,a)=1, (z,q)=1
    // bits(prev,pair) = ⌊log2 c1(prev)⌋ − ⌊log2 c2(pair)⌋:
    //   (a,b): ⌊log2 3⌋−⌊log2 3⌋ = 1−1 = 0
    //   (b,a): ⌊log2 3⌋−⌊log2 1⌋ = 1−0 = 1
    //   (z,q): 0−0 = 0
    // d1: pairs (a,b),(b,a),(a,b) → n=3, sum=1 ; d2: (a,b) → 0
    // d3: (z,q) → 0 ; d4: no bigrams → zeros
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z q"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = Vocab.surprisal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, 1L, 1.0 / 3.0), (2L, 1L, 0L, 0.0),
      (3L, 1L, 0L, 0.0), (4L, 0L, 0L, 0.0)))
  }
}
