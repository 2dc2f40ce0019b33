package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for CLAUDE.md rule 1b: the driver parses only the TAIL of
  * Bench's stdout (~2,000 chars), so the one-line JSON summary must
  * never outgrow that window — the overflow silently voided the bench
  * in rounds 1 AND 2, and the round-5 set had crept to 1,645 chars.
  * This spec bounds the WORST-CASE line length from the actual headline
  * names, so adding a query that would overflow fails in CI instead of
  * in the round artifact.
  */
class BenchHeadlineSpec extends AnyFunSuite {

  test("every headline name is a registered query") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not registered: $missing")
  }

  test("worst-case bench JSON line stays well under the driver's 2000-char tail") {
    // per entry: "name":123.456, → name + 2 quotes + colon + 7 value
    // chars + separating comma (a 3-digit-seconds value is already a
    // broken bench; 7 chars covers it)
    val entries = Bench.headline.map(_.length + 11).sum
    // skeleton with pessimistic widths: 4-digit total, 3-digit counts,
    // a "failed" list is a failing run (exit 1) so not budgeted here
    val skeleton =
      """{"metric":"total","value":9999.999,"unit":"sec","n_queries":999,"errors":0,"warm":false,"queries":{},"sf":"/root/testdata/sf0.1"}""".length
    val worstCase = skeleton + entries
    assert(worstCase <= 1700,
      s"worst-case bench line $worstCase chars (> 1700): trim Bench.headline " +
        s"(${Bench.headline.size} entries) before adding more")
  }
}
