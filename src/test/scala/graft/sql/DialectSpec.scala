package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Dialect._

class DialectSpec extends AnyFunSuite {

  /** Deterministic sampler: plain scalacheck Gen without the scalatestplus
    * bridge (not on the offline classpath). */
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- tokenizer ----
  test("tokenizer splits words, numbers, strings, symbols") {
    val toks = tokenize("SELECT a, 'it''s' FROM t WHERE x >= 1.5e3")
    assert(toks.contains(Word("SELECT")))
    assert(toks.contains(Str("'it''s'")))
    assert(toks.contains(Sym(">=")))
    assert(toks.contains(Num("1.5e3")))
  }

  test("tokenizer keeps backticked identifiers intact") {
    val toks = tokenize("SELECT `Content Rating` FROM apps")
    assert(toks.contains(Tick("`Content Rating`")))
  }

  // ---- LIKE → anchored RLIKE (dfsql LIKE is a Python regex) ----
  test("LIKE 'pat' lowers to RLIKE '^(?:pat)'") {
    assert(lower("SELECT * FROM t WHERE name LIKE '.*Owen.*'") ===
      "SELECT * FROM t WHERE name RLIKE '^(?:.*Owen.*)'")
  }

  test("NOT LIKE keeps the NOT") {
    assert(lower("SELECT 1 WHERE a NOT LIKE 'x.*'") ===
      "SELECT 1 WHERE a NOT RLIKE '^(?:x.*)'")
  }

  test("LIKE inside a string literal is untouched") {
    assert(lower("SELECT 'I LIKE cats' AS s FROM t") ===
      "SELECT 'I LIKE cats' AS s FROM t")
  }

  // ---- ^ → POWER ----
  test("a ^ b becomes POWER(a, b)") {
    assert(lower("SELECT x ^ 2 FROM t") === "SELECT POWER ( x , 2 ) FROM t")
  }

  test("power chains are right-associative") {
    assert(lower("SELECT a ^ b ^ c FROM t") ===
      "SELECT POWER ( a , POWER ( b , c ) ) FROM t")
  }

  test("parenthesized and function operands") {
    assert(lower("SELECT (a + b) ^ abs(c) FROM t") ===
      "SELECT POWER ( ( a + b ) , abs ( c ) ) FROM t")
  }

  // ---- CAST name mapping ----
  test("pandas cast names map to Spark SQL types") {
    assert(lower("SELECT CAST(x AS str) FROM t") ===
      "SELECT CAST ( x AS STRING ) FROM t")
    assert(lower("SELECT CAST(x AS int) FROM t") ===
      "SELECT CAST ( x AS BIGINT ) FROM t")
    assert(lower("SELECT CAST(x AS float) FROM t") ===
      "SELECT CAST ( x AS DOUBLE ) FROM t")
  }

  test("SQL-style cast names pass through") {
    assert(lower("SELECT CAST(x AS DECIMAL(4,2)) FROM t") ===
      "SELECT CAST ( x AS DECIMAL ( 4 , 2 ) ) FROM t")
  }

  test("a plain alias named like a pandas type is NOT rewritten") {
    // documents really has a column named text; SELECT trim(text) AS text
    // must come back with column text, not STRING
    assert(lower("SELECT trim(text) AS text FROM documents") ===
      "SELECT trim ( text ) AS text FROM documents")
    assert(lower("SELECT a AS int, CAST(b AS int) AS c FROM t") ===
      "SELECT a AS int , CAST ( b AS BIGINT ) AS c FROM t")
  }

  test("cast mapping still fires in nested expressions inside CAST") {
    assert(lower("SELECT CAST(f(x, 1) AS float64) FROM t") ===
      "SELECT CAST ( f ( x , 1 ) AS DOUBLE ) FROM t")
  }

  test("backslash-escaped quote does not end a string literal") {
    val toks = tokenize("""SELECT 'it\'s' AS s FROM t""")
    assert(toks.contains(Str("""'it\'s'""")))
    // and rewrites never fire inside the literal's content
    assert(lower("""SELECT 'a LIKE b \' x ^ 2' AS s FROM t""") ===
      """SELECT 'a LIKE b \' x ^ 2' AS s FROM t""")
  }

  // ---- implicit FROM injection (df.sql accessor) ----
  test("FROM-less SELECT gets from temp") {
    assert(addImplicitFrom("SELECT passenger_id", "temp") ===
      "SELECT passenger_id from temp")
  }

  test("SELECT with FROM is untouched") {
    assert(addImplicitFrom("SELECT a FROM t WHERE b > 1", "temp") ===
      "SELECT a FROM t WHERE b > 1")
  }

  test("insert lands before WHERE") {
    assert(addImplicitFrom("SELECT a WHERE b > 1", "temp") ===
      "SELECT a from temp WHERE b > 1")
  }

  test("nested FROM-less subquery also gets the FROM") {
    assert(addImplicitFrom("SELECT a WHERE b IN (SELECT c WHERE d > 1)", "temp") ===
      "SELECT a from temp WHERE b IN ( SELECT c from temp WHERE d > 1 )")
  }

  test("regression: inner subquery ending before outer insert point (unsorted positions crash)") {
    // inner SELECT's insert point (its `)`) precedes the outer's (WHERE)
    assert(addImplicitFrom("SELECT (SELECT max(a)) m WHERE b > 0", "temp") ===
      "SELECT ( SELECT max ( a ) from temp ) m from temp WHERE b > 0")
  }

  test("insert lands before unbalanced close-paren of an enclosing query") {
    assert(addImplicitFrom("SELECT x FROM (SELECT a WHERE b = 1) q", "temp") ===
      "SELECT x FROM ( SELECT a from temp WHERE b = 1 ) q")
  }

  private val identGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
      .suchThat(w => w.toLowerCase != "from" && w.toLowerCase != "select")

  test("property: injection output always mentions the table for a bare SELECT") {
    samples(identGen).foreach { col =>
      assert(addImplicitFrom(s"SELECT $col", "temp").contains("from temp"))
    }
  }

  test("property: queries already containing FROM never gain a second one") {
    samples(identGen).foreach { col =>
      assert(!addImplicitFrom(s"SELECT $col FROM tbl", "temp").contains("temp"))
    }
  }

  test("property: lowering is idempotent on power-free, like-free SQL") {
    samples(identGen).foreach { col =>
      val sql = s"SELECT $col , count ( * ) FROM t GROUP BY $col"
      assert(lower(lower(sql)) === lower(sql))
    }
  }
}
