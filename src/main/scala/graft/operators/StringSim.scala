package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Materialize.Ops

/** Approximate string joins: q-gram candidate generation with a
  * document-frequency cap, length filtering, and exact Levenshtein
  * verification (Gravano et al., "Approximate string joins in a
  * database (almost) for free", VLDB 2001).
  *
  * 100 TB shape: the candidate stage is an inverted-index equi-join on
  * rare q-grams — never a cross join — with the same df-cap skew guard
  * as the shingle dedup family (a gram shared by every string carries
  * no signal and would turn the self-join quadratic). Verification
  * pays the O(len²) DP only on surviving candidate pairs.
  *
  * Contract note: with the df cap, recall is heuristic — a pair whose
  * every shared gram is capped generates no candidate (the classic
  * precision/recall knob of filtered string joins). The oracle replays
  * these ACTUAL semantics (cap included), so the gate asserts the real
  * pipeline, not a recall assumption.
  */
object StringSim {

  /** Pairs of rows whose `str` values are within `maxDist` edits,
    * found via shared rare q-grams. Output: (id_a, id_b, dist). */
  def editDistanceJoin(
      df: DataFrame, id: String, str: String,
      maxDist: Int = 2, q: Int = 3, maxDf: Int = 20): DataFrame = {
    // distinct positional q-grams per row; strings shorter than q emit
    // none (mirrors DuckDB's empty range — both engines agree)
    val gramArr = when(length(col("s")) >= q,
      array_distinct(transform(
        sequence(lit(1), length(col("s")) - (q - 1)),
        i => col("s").substr(i, lit(q)))))
      .otherwise(array())
    val gd = df.select(col(id).as("gid"), col(str).as("s"))
      .select(col("gid"), col("s"), explode(gramArr).as("gram"))
      .materializeOnce() // feeds the df aggregate AND both join sides
    val rare = gd.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("gram"))
    val a = gd.join(rare, Seq("gram"))
      .select(col("gram"), col("gid").as("id_a"), col("s").as("sa"))
    val b = gd.select(col("gram"), col("gid").as("id_b"), col("s").as("sb"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("sa")) - length(col("sb"))) <= maxDist)
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        // long, not int: no non-int64 integer in a final oracled schema
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .orderBy(col("id_a"), col("id_b"))
  }
}
