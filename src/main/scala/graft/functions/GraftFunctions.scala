package graft.functions

import graft.plans.{CosineSim, HyperplaneBuckets, MinHashSig, SimHash60}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions.{call_function, lit}

/** Session registration + Column builders for the native Catalyst
  * expressions in graft.plans. Spark 4's unified Column API has no
  * public Expression→Column constructor, so the expressions are
  * registered in the session FunctionRegistry and invoked via
  * `call_function` (resolved at analysis).
  *
  * `register` is idempotent; operators call it on their input's
  * session before building plans. SQL users get the same functions by
  * name (`SELECT graft_simhash60(...)`).
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  val functions: Map[String, Seq[Expression] => Expression] = Map(
    "graft_minhash_sig" -> (es => MinHashSig(es(0), intArg(es(1), "graft_minhash_sig"))),
    "graft_simhash60" -> (es => SimHash60(es(0))),
    "graft_lsh_buckets" -> (es => HyperplaneBuckets(
      es(0), intArg(es(1), "graft_lsh_buckets"), intArg(es(2), "graft_lsh_buckets"))),
    "graft_cosine" -> (es => CosineSim(es(0), es(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }

  /** MinHash signature (fast path; == TextFunctions.minhashSignature). */
  def minhashSig(shingleSet: Column, numHashes: Int): Column =
    call_function("graft_minhash_sig", shingleSet, lit(numHashes))

  /** 60-bit SimHash (fast path; == TextFunctions.simhash60). */
  def simhash60Fast(shingleSet: Column): Column =
    call_function("graft_simhash60", shingleSet)

  /** All per-table LSH buckets (fast path; element t ==
    * Similarity.lshBucket(vec, t, planesPerTable)).
    */
  def lshBuckets(vec: Column, tables: Int, planesPerTable: Int): Column =
    call_function("graft_lsh_buckets", vec, lit(tables), lit(planesPerTable))

  /** Fused cosine similarity (== Similarity.cosine). */
  def cosineFast(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
}
