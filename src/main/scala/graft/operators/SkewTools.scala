package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting handles most
  * hot-key cases at runtime; these are the explicit plan-level tools
  * for when the skew is known up front (a null-heavy key, a celebrity
  * user) and the operator is an aggregation or a broadcast-averse join.
  */
object SkewTools {

  /** Two-stage salted aggregation: rows are spread over `saltBuckets`
    * sub-keys, partially aggregated per (key, salt), then finally
    * combined per key. Equivalent to a direct groupBy for any
    * associative aggregate; the first shuffle fans a hot key across
    * `saltBuckets` reducers instead of one.
    *
    * Callers pass partial and final aggregate pairs, e.g.
    * `saltedAggregate(df, Seq("k"), 16)(
    *    Seq(sum($"v").as("s"), count(lit(1)).as("c")),
    *    Seq(sum($"s").as("total"), sum($"c").as("cnt")))`
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int)(
      partial: Seq[Column],
      fin: Seq[Column]): DataFrame = {
    require(saltBuckets >= 1)
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }

  /** Salted join for a skewed fact against a small-ish dimension that
    * is still too large (or disallowed) to broadcast: the fact side
    * gets a random salt in [0, saltBuckets), the dimension side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot fact key now lands on `saltBuckets` reducers.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1)
    // right/full outer would emit one null-extended row per dim
    // REPLICA (saltBuckets copies of each unmatched dim row)
    require(Seq("inner", "left", "left_outer", "left_semi", "left_anti").contains(joinType),
      s"saltedJoin supports fact-preserving join types only, got '$joinType'")
    val saltedFact = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedFact.join(replicatedDim, keys :+ "_salt", joinType).drop("_salt")
  }
}
