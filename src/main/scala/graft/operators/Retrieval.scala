package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval and rank fusion — the search-side primitives a
  * training-data pipeline uses for decontamination lookups, nearest-
  * neighbor triage, and hybrid (lexical + embedding) candidate
  * generation.
  *
  * Scale shape: BM25 reduces the corpus to per-(doc, term) counts with
  * one aggregation over the exploded token stream filtered to the
  * query terms (the filter lands before the shuffle, so the heavy
  * stream thins to |terms| rows per doc first); corpus-level scalars
  * (N, avgdl) ride along as a broadcast 1-row frame. Fusion unions
  * per-ranking contributions and aggregates once on the id.
  */
object Retrieval {

  /** Okapi BM25 score of every document matching at least one query
    * term (lowercased whitespace tokens):
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * Returns (idCol, bm25) rounded to 4 decimals — deterministic
    * cross-engine (dl sums are exact integers; avgdl is an exact
    * integer ratio).
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val termList = terms.map(_.toLowerCase)
    val toks = df.select(col(idCol), explode(tokens(lower(col(textCol)))).as("tok"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isin(termList: _*))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
    tf.join(dfreq, "tok")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + (col("dl") / col("avgdl") * b + (1 - b)) * k1))
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 4).as("bm25"))
  }

  /** Reciprocal-rank fusion of multiple rankings (Cormack et al.):
    * each input frame carries (idCol, rank — 1-based integer); the
    * fused score is Σ 1/(k + rank) over the rankings an id appears in.
    * Integer ranks in, so the fused doubles are identical on any
    * engine/layout. Returns (idCol, rrf_score, n_lists).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, "k must be non-negative")
    rankings
      .map(_.select(col(idCol), (lit(1.0) / (lit(k) + col("rank"))).as("c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(round(sum(col("c")), 6).as("rrf_score"), count(lit(1)).as("n_lists"))
  }

  /** NDCG of ranked result lists (Järvelin & Kekäläinen 2002):
    * input (query_id, rank — 1-based, rel — nonnegative gain).
    * DCG = Σ rel/log2(rank+1); IDCG re-ranks the SAME gains
    * descending via a per-query window; queries with no relevant
    * result get ndcg = 0 (not null), so means stay defined.
    * Two per-query windows + one groupBy — no global sort, no join.
    * Returns (query_id, dcg, idcg, ndcg), rounded 6.
    */
  def ndcg(results: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("rank"))
    results
      .select(col("query_id"), col("rank"), col("rel").cast("double").as("rel"))
      .withColumn("irank", row_number().over(w).cast("long"))
      .groupBy(col("query_id"))
      .agg(
        round(sum(col("rel") / log2(col("rank") + 1)), 6).as("dcg"),
        round(sum(col("rel") / log2(col("irank") + 1)), 6).as("idcg"))
      .withColumn("ndcg",
        when(col("idcg") === 0.0, 0.0)
          .otherwise(round(col("dcg") / col("idcg"), 6)))
  }
}
