package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the BPE train→encode loop: invariants that must
  * hold for ANY corpus, sampled deterministically (plain scalacheck Gen
  * without the scalatestplus bridge — not on the offline classpath).
  */
class VocabPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(2, 4)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(1, 6)
      ws <- Gen.listOfN(nWords,
        Gen.choose(1, 5).flatMap(l =>
          Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    } yield ws.mkString(" "))
  } yield docs

  test("BPE invariants hold on sampled corpora") {
    samples(corpusGen, 6).zipWithIndex.foreach { case (texts, i) =>
      val docs = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val m2 = Vocab.bpeTrain(spark, docs, rounds = 2).collect()
      // supports are non-increasing across rounds (fusing the argmax
      // cannot create a more frequent pair)
      val sup = m2.map(_.getLong(3))
      assert(sup.zip(sup.tail).forall { case (a, b) => a >= b },
        s"corpus $i: supports increased: ${sup.toSeq}")
      def tokens(merges: Array[org.apache.spark.sql.Row]): Map[Long, (Long, Long, Long)] =
        Vocab.bpeEncode(docs,
          merges.map(r => (r.getString(1), r.getString(2))).toSeq)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
      val t0 = tokens(Array.empty)          // zero merges: tokens = chars
      val t1 = tokens(m2.take(1))
      val t2 = tokens(m2)
      t0.foreach { case (id, (nw, nc, nt)) =>
        assert(nt === nc, s"corpus $i doc $id: unmerged tokens != chars")
        // chars are conserved by ANY merge table; tokens shrink
        // monotonically with more merges but never below word count
        val (nw1, nc1, nt1) = t1(id)
        val (nw2, nc2, nt2) = t2(id)
        assert(nw1 === nw && nc1 === nc && nw2 === nw && nc2 === nc)
        assert(nt >= nt1 && nt1 >= nt2, s"corpus $i doc $id: non-monotone")
        assert(nt2 >= nw, s"corpus $i doc $id: tokens below word count")
      }
    }
  }
}
