package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns: salting for hot keys. AQE's skew-join
  * splitting handles most cases at runtime; explicit salting remains the
  * tool of choice when one reduce key dominates an aggregation, or a
  * broadcast isn't possible and a single join key floods one task.
  * Both transformations are result-identical to their naive forms (the
  * oracled queries assert exactly that).
  */
object Skew {

  /** Two-phase aggregation: spread each group over `salts` sub-groups,
    * partially aggregate, then merge. The hot key's work lands on `salts`
    * tasks instead of one. `saltExpr` must be deterministic (e.g.
    * xxhash64 of a row-unique column) — never rand(), which breaks
    * retry/replay semantics. */
  def saltedSum(
      df: DataFrame, keys: Seq[String], value: Column, as: String,
      saltExpr: Column, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltExpr, lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(as))
  }

  /** Salted equi-join: the big (skewed) side gets a deterministic salt,
    * the small side is replicated across all salt values, and the join
    * key becomes (key, salt) — splitting each hot key's rows across
    * `salts` tasks. Replication multiplies the small side by `salts`,
    * so this is for moderate dimension tables, not fact-fact joins. */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltExpr: Column, salts: Int = 8): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(saltExpr, lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    bigS.join(smallS,
      col(bigKey) === col(smallKey) && bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }
}
