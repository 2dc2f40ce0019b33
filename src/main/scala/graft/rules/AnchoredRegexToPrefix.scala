package graft.rules

import org.apache.spark.sql.catalyst.expressions.{Literal, RLike, StartsWith}
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
  * `^(?:L)`   → StartsWith(col, L)   (re.match is prefix-anchored only)
  * `^(?:L.*)` → StartsWith(col, L)
  * Anything else is left untouched — including `^(?:L$)`: regex `$`
  * also matches before a final line terminator, so EqualTo would drop
  * rows whose value ends in `\n` (prefix forms have no such subtlety).
  */
object AnchoredRegexToPrefix extends Rule[LogicalPlan] {

  private val meta = "\\.[](){}*+?|^$".toSet

  /** The literal prefix of an anchored prefix pattern, if it is one. */
  private[rules] def literalForm(pattern: String): Option[String] = {
    if (!(pattern.startsWith("^(?:") && pattern.endsWith(")"))) return None
    var body = pattern.substring(4, pattern.length - 1)
    if (body.endsWith(".*")) body = body.dropRight(2)
    if (body.exists(meta.contains)) None else Some(body)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(left, Literal(p: UTF8String, StringType)) =>
        literalForm(p.toString) match {
          case Some(lit) => StartsWith(left, Literal(lit))
          case None => r
        }
    }
}
