package graft.rules

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal, RLike, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule: anchored literal-prefix regexes become prefix
  * predicates.
  *
  * The dfsql dialect lowers `LIKE 'pat'` to `RLIKE '^(?:pat)'` (Python
  * re.match semantics). When `pat` is a plain literal (`abc`) or a
  * literal prefix (`abc.*`), the regex is exactly a prefix test — but
  * RLIKE is opaque to data sources, while StartsWith pushes down to
  * parquet as StringStartsWith and prunes row groups by min/max stats.
  * At 100 TB that is the difference between scanning the corpus and
  * skipping most of it.
  *
  * `^(?:L)`    → StartsWith(col, L)   (re.match is prefix-anchored only)
  * `^(?:L.*)`  → StartsWith(col, L)
  * `^(?:L$)`   → col = L
  * anything containing other metacharacters is left untouched.
  */
object AnchoredRegexToPrefix extends Rule[LogicalPlan] {

  private val meta = "\\.[](){}*+?|^$".toSet

  /** The literal prefix of an anchored pattern, if it is exactly one. */
  private[rules] def literalForm(pattern: String): Option[(String, Boolean)] = {
    if (!(pattern.startsWith("^(?:") && pattern.endsWith(")"))) return None
    var body = pattern.substring(4, pattern.length - 1)
    val exact = body.endsWith("$")
    if (exact) body = body.dropRight(1)
    val prefixOnly = body.endsWith(".*")
    if (prefixOnly) body = body.dropRight(2)
    if (exact && prefixOnly) return None // `L.*$` is not a pure prefix test
    if (body.exists(meta.contains)) None else Some((body, exact))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(left, Literal(p: UTF8String, StringType)) =>
        literalForm(p.toString) match {
          case Some((lit, true)) => EqualTo(left, Literal(lit))
          case Some((lit, false)) => StartsWith(left, Literal(lit))
          case None => r
        }
    }
}
