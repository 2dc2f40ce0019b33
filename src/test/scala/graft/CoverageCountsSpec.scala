package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** README.md is the coverage map the round gate audits against, and its
  * verification numbers went stale twice (r10 "what's missing" #4:
  * 291/476 claimed vs 293/477 actual). These tests DERIVE every count
  * the README claims from the code itself, so the coverage map can't
  * lag the registry again — adding a query or a test without refreshing
  * the README fails CI with the correct number in the message.
  */
class CoverageCountsSpec extends AnyFunSuite {

  private lazy val readme = Files.readString(Paths.get("README.md"))

  test("README registered-query count matches SparkEntry.queries") {
    val n = SparkEntry.queries.size
    assert(readme.contains(s"All $n registered queries hash-match"),
      s"README stale: the registry has $n queries")
    assert(readme.contains(s"across the $n registered"),
      s"README bench paragraph stale: the registry has $n queries")
  }

  test("README gate total = registered queries + in-gate fuzz cases") {
    val gate = SparkEntry.queries.size + graft.tools.FuzzDump.GateN
    assert(readme.contains(s"$gate/$gate DuckDB hash-match"),
      s"README stale: the gate now checks $gate entries " +
        s"(${SparkEntry.queries.size} queries + ${graft.tools.FuzzDump.GateN} fuzz)")
    // the breakdown parenthetical below the gate line went stale in r11
    // (ADVICE r11 #3) because only the headline substring was derived —
    // pin the arithmetic too
    assert(readme.contains(s"($gate = ${SparkEntry.queries.size} " +
      s"registered queries + ${graft.tools.FuzzDump.GateN} seeded fuzz"),
      s"README stale: breakdown parenthetical must read " +
        s"($gate = ${SparkEntry.queries.size} registered queries + " +
        s"${graft.tools.FuzzDump.GateN} seeded fuzz cases ...)")
  }

  test("the full-gate sf0.1 status sentence is derived and doc-identical") {
    // VERDICT r12 directive #4: README and ARCHITECTURE once described
    // DIFFERENT sf0.1 runs (526/526 vs 536/536 — both true, neither
    // derived). One canonical line now lives in BOTH docs; its counts
    // are asserted against the live registry here, and the two files
    // must carry the IDENTICAL line (the free-text round suffix
    // included), so they can never again describe different runs.
    val gate = SparkEntry.queries.size + graft.tools.FuzzDump.GateN
    val prefix = s"Full-gate sf0.1 status: $gate/$gate " +
      s"(= ${SparkEntry.queries.size} registered queries + " +
      s"${graft.tools.FuzzDump.GateN} seeded fuzz cases) hash-matched " +
      "at BOTH sf0.01 and sf0.1, last full sf0.1 replay round "
    val arch = Files.readString(Paths.get("ARCHITECTURE.md"))
    def statusLine(doc: String, name: String): String = {
      val lines = doc.linesIterator
        .filter(_.trim.startsWith("Full-gate sf0.1 status:")).toSeq
      assert(lines.size == 1, s"$name must carry exactly one status line")
      lines.head.trim
    }
    val r = statusLine(readme, "README.md")
    val a = statusLine(arch, "ARCHITECTURE.md")
    assert(r.startsWith(prefix),
      s"status line counts stale — expected it to start with: $prefix")
    assert(r == a,
      "README.md and ARCHITECTURE.md carry different full-gate status lines")
  }

  test("README suite-case count matches the test sources") {
    // every case in this repo is a funsuite `test(` at (indented) line
    // start — the same proxy as `grep -rc '^\s*test('`, which matches
    // the scalatest-reported total exactly today; a new style (e.g.
    // scalacheck `property(`) would undercount and fail here, which is
    // the correct prompt to extend this counter
    val testRe = """(?m)^\s*test\(""".r
    val walk = Files.walk(Paths.get("src/test"))
    val cases =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .map(p => testRe.findAllIn(
          // count at line grain, not file grain
          Files.readAllLines(p).asScala.mkString("\n")).size)
        .sum
      finally walk.close()
    assert(readme.contains(s"full ScalaTest suite ($cases cases)"),
      s"README stale: test sources define $cases cases")
  }
}
