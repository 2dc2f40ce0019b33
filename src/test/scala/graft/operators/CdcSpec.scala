package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking (d68) — structural invariants that hold for
  * EITHER hash mode (the boundary set is hash-dependent; the properties
  * below are not), plus the self-synchronization guarantee that is the
  * operator's whole reason to exist. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.load(spark, sf0001, "documents")

  // long enough that boundaries certainly fire under both hash modes
  // (P[no cut] = (7/8)^windows ≈ 1e-8 at ~140 windows; values asserted
  // below are deterministic for the fixed text, not probabilistic)
  private lazy val longText: String =
    (1 to 144).map(i => s"tok${i % 37}w${(i * 7) % 11}").mkString(" ")

  for (oracleHash <- Seq(false, true)) {
    val mode = if (oracleHash) "poly" else "xxhash64"

    test(s"chunks partition the token array exactly [$mode]") {
      // join back to the raw token counts: sum(clen) must equal them
      val withTc = Dedup.cdcChunkStats(docs, oracleHash = oracleHash)
        .join(docs.select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
            .as("n_raw")), Seq("doc_id"))
      assert(withTc.filter(col("n_tokens") =!= col("n_raw")).count() === 0L)
      // every doc appears exactly once, dup counts bounded by totals
      val bad = withTc.filter(col("n_dup_chunks") > col("n_chunks") ||
        col("dup_tokens") > col("n_tokens")).count()
      assert(bad === 0L)
    }

    test(s"chunk ordinals are contiguous from 0 per doc [$mode]") {
      val t = Dedup.cdcChunkTable(docs, oracleHash = oracleHash)
      val perDoc = t.groupBy("doc_id").agg(
        count(lit(1)).as("n"), min("chunk_idx").as("mn"),
        max("chunk_idx").as("mx"))
      assert(perDoc.filter(col("mn") =!= 0L || col("mx") =!= col("n") - 1)
        .count() === 0L)
    }

    test(s"identical docs produce identical chunk sequences [$mode]") {
      val two = Seq((10L, longText), (11L, longText)).toDF("doc_id", "text")
      val t = Dedup.cdcChunkTable(two, oracleHash = oracleHash)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val a = t.filter(_._1 == 10L).map(x => (x._2, x._3, x._4)).sortBy(_._1)
      val b = t.filter(_._1 == 11L).map(x => (x._2, x._3, x._4)).sortBy(_._1)
      assert(a.nonEmpty && a.length > 3) // boundaries actually fired
      assert(a.toSeq === b.toSeq)
      // ... and the stats operator marks every chunk duplicated
      val st = Dedup.cdcChunkStats(two, oracleHash = oracleHash).collect()
      assert(st.forall(r => r.getLong(3) == r.getLong(1))) // n_dup == n_chunks
      assert(st.forall(r => r.getDouble(5) == 1.0))
    }

    test(s"self-synchronization: a head edit leaves suffix chunks intact [$mode]") {
      val edited = "zz0 zz1 zz2 " + longText // 3 tokens inserted at the front
      val two = Seq((20L, longText), (21L, edited)).toDF("doc_id", "text")
      val t = Dedup.cdcChunkTable(two, oracleHash = oracleHash).collect()
      val orig = t.filter(_.getLong(0) == 20L)
        .sortBy(_.getLong(1)).map(r => r.getLong(2)).toSeq
      val edit = t.filter(_.getLong(0) == 21L).map(_.getLong(2)).toSet
      // every original chunk after the first boundary is content-local,
      // so it must reappear verbatim in the edited doc's chunk set —
      // only the head chunk (which absorbed the insertion) may differ
      val suffix = orig.drop(1)
      assert(suffix.nonEmpty)
      val missing = suffix.filterNot(edit.contains)
      assert(missing.isEmpty,
        s"suffix chunks lost across a head edit: ${missing.take(3)}")
    }
  }

  test("short docs (< k tokens) form exactly one chunk") {
    val tiny = Seq((30L, "one two"), (31L, "single")).toDF("doc_id", "text")
    val t = Dedup.cdcChunkTable(tiny).collect()
    assert(t.length === 2)
    assert(t.forall(_.getLong(1) == 0L))
    assert(t.find(_.getLong(0) == 30L).get.getLong(3) === 2L)
    assert(t.find(_.getLong(0) == 31L).get.getLong(3) === 1L)
  }

  test("property: partition + self-sync hold on 60 random docs with random edits") {
    // seeded ScalaCheck-style sweep without fixture bias: random token
    // streams of random lengths, each given a random-length head
    // insertion; the partition property and the suffix-chunk guarantee
    // must hold for every single one (they are theorems, not averages)
    val rnd = new scala.util.Random(20260816L)
    val docs = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(200)
      val base = (0 until n).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
      val ins = (0 until 1 + rnd.nextInt(6)).map(_ => s"z${rnd.nextInt(9)}")
        .mkString(" ")
      (i.toLong, base, ins)
    }
    val frame = docs.flatMap { case (id, base, ins) =>
      Seq((id * 2, base), (id * 2 + 1, s"$ins $base"))
    }.toDF("doc_id", "text")
    val t = Dedup.cdcChunkTable(frame).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3)))
      }
    docs.foreach { case (id, base, _) =>
      val orig = t(id * 2); val edit = t(id * 2 + 1)
      // partition: lengths sum to the token count
      assert(orig.map(_._2).sum === base.split(" ").length.toLong, s"doc $id")
      // self-sync: every original chunk after the first boundary
      // reappears verbatim in the edited doc's chunk set
      val editSet = edit.map(_._1).toSet
      val missing = orig.drop(1).filterNot(c => editSet.contains(c._1))
      assert(missing.isEmpty, s"doc $id lost suffix chunks: ${missing.take(3)}")
    }
  }

  test("boundary density is near 1/div on the real corpus") {
    val t = Dedup.cdcChunkTable(docs)
    val n = t.groupBy().agg(sum("clen").as("toks"), count(lit(1)).as("chunks"))
      .collect()(0)
    val meanLen = n.getLong(0).toDouble / n.getLong(1)
    // expected mean chunk length ≈ div + (k-1) edge effects; generous band
    assert(meanLen > 4.0 && meanLen < 40.0, s"mean chunk len $meanLen")
  }
}
