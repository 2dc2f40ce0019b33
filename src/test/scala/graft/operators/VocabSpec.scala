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
}
