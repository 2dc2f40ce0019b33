package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.RollingHash

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "the quick brown fox"),
    (2L, "fox brown quick the"),
    (3L, "le chat et le chien"),
    (4L, "a b, c! d?")
  ).toDF("id", "text")

  test("tokenCount counts whitespace tokens") {
    val counts = df.select($"id", TextFunctions.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(1L) === 4 && counts(4L) === 4)
  }

  test("punctCount counts class members only") {
    val n = df.filter($"id" === 4)
      .select(TextFunctions.punctCount($"text")).head.getInt(0)
    assert(n === 3)
  }

  test("canonicalFingerprint equal for word permutations, md5 not") {
    val fps = df.filter($"id" <= 2).select(
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.canonicalFingerprint($"text").as("cfp"))
      .collect()
    assert(fps(0).getString(0) !== fps(1).getString(0))
    assert(fps(0).getString(1) === fps(1).getString(1))
  }

  test("langId picks the language with most marker hits") {
    val langs = df.select($"id", TextFunctions.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) === "en")
    assert(langs(3L) === "fr")
    assert(langs(4L) === "und")
  }

  test("shingles produces n-1 overlapping distinct 2-grams") {
    val sh = df.filter($"id" === 1)
      .select(TextFunctions.shingles($"text", 2).as("s"))
      .head.getSeq[String](0)
    assert(sh.toSet === Set("the quick", "quick brown", "brown fox"))
  }

  test("windowsFromTokens keeps position and multiplicity, unlike shingles") {
    def wins(text: String, n: Int): Seq[String] =
      Seq(Tuple1(text)).toDF("t")
        .select(TextFunctions.windowsFromTokens(
          TextFunctions.tokens($"t"), n).as("w"))
        .head.getSeq[String](0)
    // ordered, overlapping, repeats preserved (shingles dedups these)
    assert(wins("a b a b a b", 2) ===
      Seq("a b", "b a", "a b", "b a", "a b"))
    // short doc: one truncated window (same slice semantics as shingles)
    assert(wins("a b c", 4) === Seq("a b c"))
    // empty text yields no windows, not one empty window
    assert(wins("   ", 3) === Seq.empty)
  }

  test("RollingHash matches a reference Scala implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xff))
    val got = df.select($"text", RollingHash($"text").as("h")).collect()
    got.foreach(r => assert(r.getLong(1) === ref(r.getString(0))))
  }

  test("RollingHash survives whole-stage codegen and interpreted paths") {
    val expected = df.select(RollingHash($"text")).collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      val interp = df.select(RollingHash($"text")).collect().map(_.getLong(0))
      assert(interp.toSeq === expected.toSeq)
    }
  }

  private def withSQLConf[A](kv: (String, String)*)(f: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("quality score lands in [0,1]") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val mm = docs.select(
      min(TextFunctions.qualityScore($"text")).as("lo"),
      max(TextFunctions.qualityScore($"text")).as("hi")).head
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("sentiment lexicon counts occurrences, not types (t47)") {
    import spark.implicits._
    val df = Seq(
      (1L, "fast fast slow merge plain"),  // pos 3 (fast×2, merge), neg 1
      (2L, "plain words only here")        // neutral
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextFunctions.positiveCount($"text").as("p"),
      TextFunctions.negativeCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((3L, 1L)))
    assert(out(2L) === ((0L, 0L)))
  }

  test("vowelGroups / monosyllableCount: FORCAST word-difficulty counters") {
    import spark.implicits._
    val df = Seq(
      (1L, "strength table beautiful xyz"), // 1, 2 (a,e), 3 (eau,i,u), 1 (y)
      (2L, "zzz qqq"),                      // 0-vowel tokens are not mono
      (3L, "")                              // trim("") -> [""] -> 0 mono
    ).toDF("id", "text")
    val out = df.select(col("id"),
      graft.functions.TextFunctions.monosyllableCount(col("text")).as("m"),
      graft.functions.TextFunctions.vowelGroups(lit("beautiful")).as("vg"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out(1L)._1 === 2, "strength + xyz are monosyllabic; table has 2 groups")
    assert(out(2L)._1 === 0)
    assert(out(3L)._1 === 0)
    assert(out(1L)._2 === 3, "b-eau-t-i-f-u-l has three vowel-group runs")
  }
}
