package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** The spec's own BigInt replica of the fixed-point term score —
    * independent arithmetic, same contract (Retrieval.scala scaling). */
  private def termScore(n: Long, l: Long, df: Long, tf: Long, dl: Long): BigInt = {
    val r = (BigInt(1000000) * dl * n) / l
    (BigInt(10000) * (2 * (n - df) + 1) * (BigInt(22000000) * tf)) /
      ((BigInt(2) * df + 1) * (BigInt(10000000) * tf + 3000000 + 9 * r))
  }

  test("bm25TopK matches a hand-replicated fixed-point score on a tiny corpus") {
    // corpus: N=3 docs, L=9 tokens; query {apple, pie}
    val docs = Seq(
      (1L, "apple pie apple"),   // tf(apple)=2, tf(pie)=1, dl=3
      (2L, "apple cake x y"),    // tf(apple)=1, dl=4
      (3L, "banana z")           // no match, dl=2
    ).toDF("doc_id", "text")
    val queries = Seq((0L, "apple"), (0L, "pie")).toDF("query_id", "w")

    val out = Retrieval.bm25TopK(docs, queries, 10).collect()
      .map(r => (r.getLong(2), (r.getLong(1), r.getLong(3), r.getLong(4)))).toMap

    val (n, l) = (3L, 9L)
    val d1 = termScore(n, l, df = 2, tf = 2, dl = 3) + // apple in 2 docs
      termScore(n, l, df = 1, tf = 1, dl = 3)          // pie in 1 doc
    val d2 = termScore(n, l, df = 2, tf = 1, dl = 4)
    assert(out(1L) === ((1L, d1.toLong, 2L)), s"doc1 got ${out(1L)}")
    assert(out(2L) === ((2L, d2.toLong, 1L)), s"doc2 got ${out(2L)}")
    assert(!out.contains(3L), "unmatched doc must not appear")
    assert(d1 > d2, "two matched terms must outrank one")
  }

  test("rarer term dominates under the rational idf (retrieval sanity)") {
    // 'rare' hits 1 of 12 docs, 'common' hits 11 of 12; equal tf/dl →
    // the rare-term doc must rank first for the two-term query.
    val docs = ((1L to 11L).map(i => (i, s"common pad$i")) :+
      (12L, "rare pad12")).toDF("doc_id", "text")
    val queries = Seq((0L, "rare"), (0L, "common")).toDF("query_id", "w")
    val top = Retrieval.bm25TopK(docs, queries, 1).collect()(0)
    assert(top.getLong(2) === 12L, s"rare-term doc not ranked 1: $top")
  }

  test("ranks are dense per query with a doc_id tiebreak") {
    // identical docs → identical scores; rank order must be doc_id
    val docs = (1L to 5L).map(i => (i, "tie tie")).toDF("doc_id", "text")
    val queries = Seq((0L, "tie"), (1L, "tie")).toDF("query_id", "w")
    val out = Retrieval.bm25TopK(docs, queries, 3).collect()
    assert(out.length === 6)
    for (q <- Seq(0L, 1L)) {
      val rows = out.filter(_.getLong(0) == q).sortBy(_.getLong(1))
      assert(rows.map(_.getLong(1)).toList === List(1L, 2L, 3L))
      assert(rows.map(_.getLong(2)).toList === List(1L, 2L, 3L),
        "equal scores must tiebreak by doc_id")
      assert(rows.map(_.getLong(3)).distinct.length === 1)
    }
  }

  test("postings prune broadcasts the query terms (inverted-index access path)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val df = Retrieval.bm25TopKDerived(docs, 10)
    df.collect() // final AQE plan (rule 8)
    val names = graft.tools.PlanInspect.nodeNames(df)
    assert(names.exists(_.contains("BroadcastHashJoin")),
      s"query-term prune did not broadcast: ${names.distinct.mkString(",")}")
  }

  test("rrfFuse: hand-computed fusion, consensus beats either single arm") {
    // doc 7 is rank 2 in BOTH arms; doc 1 is rank 1 sparse-only, doc 2
    // rank 1 dense-only. RRF: d7 = 2·⌊1e9/62⌋ = 32258064, d1 = d2 =
    // ⌊1e9/61⌋ = 16393442 → consensus doc wins, singles tiebreak by id.
    val sparse = Seq((0L, 1L, 1L), (0L, 7L, 2L)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 2L, 1L), (0L, 7L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(sparse, dense), k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toList === List(
      (1L, 7L, 2L * (1000000000L / 62), 2L),
      (2L, 1L, 1000000000L / 61, 1L),
      (3L, 2L, 1000000000L / 61, 1L)))
  }

  test("rrfFuse keeps queries independent and respects k") {
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 9L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(a), k = 1).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toList ===
      List((0L, 1L), (1L, 9L)))
  }

  test("derived queries: 6 terms, 2 queries, stable under re-derivation") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val toks = Retrieval.postings(docs)
    val a = Retrieval.frequencyDerivedQueries(toks).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toList
    val b = Retrieval.frequencyDerivedQueries(toks).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toList
    assert(a === b, "query derivation must be deterministic")
    assert(a.length === 6 && a.map(_._1).distinct === List(0L, 1L))
  }

  test("s64_ndcg: per-query nDCG@10 invariants and the shared weight table") {
    // independent replica of the rule-12 constants
    val w = (1 to 10).map(i =>
      Math.round(1e12 / (Math.log(i + 1.0) / Math.log(2.0))))
    assert(w.head === 1000000000000L) // 1/log2(2) = 1
    assert(w === w.sorted.reverse, "discounts must decrease with rank")
    val idcg = w.scanLeft(0L)(_ + _).tail
    val rows = graft.SparkEntry.queries("s64_ndcg")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 5, "one row per fixed query vector")
    rows.foreach { r =>
      val rAvail = r.getLong(1)
      val dcg = r.getLong(2); val ideal = r.getLong(3)
      val ndcg = r.getDouble(4)
      assert(rAvail >= 0L && rAvail <= 10L)
      assert(ideal === (if (rAvail < 1) 0L else idcg(rAvail.toInt - 1)),
        s"idcg must be the prefix sum at r_avail=$rAvail")
      assert(dcg >= 0L && dcg <= ideal,
        "DCG cannot exceed the ideal ordering's DCG")
      if (ideal > 0)
        assert(ndcg === dcg.toDouble / ideal.toDouble && ndcg <= 1.0)
    }
  }

  // ---- exact phrase search (t78) ----

  test("phraseSearch: hand-computed matches, overlaps counted, ranks total") {
    val tiny = Seq(
      (0L, "a b a b a"), // "a b" at 0,2; "a b a" at 0,2 (overlapping)
      (1L, "a b c"),
      (2L, "c c c")
    ).toDF("doc_id", "text")
    val out = graft.operators.Retrieval
      .phraseSearch(tiny, phrases = Seq("a b", "a b a"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("a b", 1L, 0L, 2L, 2L, 3L),
      ("a b", 2L, 1L, 1L, 2L, 3L),
      ("a b a", 1L, 0L, 2L, 1L, 2L)))
  }

  test("phraseSearch: default phrase set returns ranked hits on the corpus") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = graft.operators.Retrieval.phraseSearch(docs).collect()
    assert(out.nonEmpty)
    // per phrase: ranks are 1..≤3 and match counts are non-increasing
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      val ms = sorted.map(_.getLong(3))
      assert(ms.zip(ms.tail).forall { case (a, b) => a >= b })
      // totals are shared across the phrase's rows and bound the top docs
      assert(rows.map(_.getLong(4)).distinct.length === 1)
      assert(rows.forall(r => r.getLong(3) <= r.getLong(5)))
    }
  }
}
