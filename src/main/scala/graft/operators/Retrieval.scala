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
  * Scale shape: BM25 computes per-document length and per-term
  * frequencies IN-ROW from the token array — the corpus is scanned
  * once and the token stream never shuffles; only the thin
  * (doc, term, tf) frame (≤ |terms| rows per matching doc) and two
  * term-/corpus-level scalars move. Fusion unions per-ranking
  * contributions and aggregates once on the id.
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
    // distinct: one in-row counter per term (the grouped formulation
    // deduplicated repeated query terms implicitly)
    val termList = terms.map(_.toLowerCase).distinct
    // dl and per-term tf are in-row array reductions over the token
    // array — the corpus is scanned once and the token stream never
    // shuffles (the exploded formulation shuffled every token for the
    // dl aggregate). `split` yields at least one element for non-null
    // text, so size(w) equals the exploded per-doc row count exactly;
    // null text produced no exploded rows and is filtered the same.
    val perDoc = df
      .select(col(idCol), tokens(lower(col(textCol))).as("w"))
      .filter(col("w").isNotNull)
      .select(col(idCol), size(col("w")).cast("long").as("dl"),
        array(termList.map(t => struct(
          lit(t).as("tok"),
          size(filter(col("w"), x => x === lit(t))).cast("long").as("tf"))): _*)
          .as("_tfs"))
      // one compact row per document (id, dl, |terms| counts) — far
      // smaller than the raw text; materialized so the stats scalar
      // and the tf frame don't each re-tokenize the corpus.
      // NOTE: this makes bm25() EAGER — constructing the returned
      // DataFrame runs a Spark job, and each call re-materializes the
      // per-doc frame. Callers scoring several term sets over the same
      // corpus should tokenize once upstream rather than call bm25 in
      // a loop.
      .localCheckpoint(true)
    val stats = perDoc.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = perDoc
      .select(col(idCol), col("dl"), explode(col("_tfs")).as("t"))
      .select(col(idCol), col("dl"), col("t.tok").as("tok"), col("t.tf").as("tf"))
      .filter(col("tf") > 0)
    // one row per query term — broadcast by construction
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
    tf.join(broadcast(dfreq), "tok")
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

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    * 1998): greedily select `k` of each query's candidates maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-selected — the
    * diversity-aware cut of a redundant top-k.
    *
    * Inputs: `candidates` (query_id, cand_id, rel) — a BOUNDED
    * per-query candidate set (an upstream top-k, not a corpus) — and
    * `pairSims` (query_id, a, b, s) holding both orientations of each
    * intra-candidate-set similarity, both with 6-dp-rounded
    * similarities. `pairSims` may be SPARSE: a (cand, selected) pair
    * with no row is treated as similarity 0 (zero-sim rows can be
    * omitted at build time). Each greedy step pairs remaining
    * candidates with the selected set, left-joins the sims, and takes
    * a per-query window argmax: cost is bounded by |candidates|·k per
    * query, never corpus-sized.
    *
    * Scores are EXACT INTEGERS: similarities scale to micro-units
    * (round(s·1e6)) and the weights are integer tenths, so
    * score = relTenths·rel_µ − divTenths·ms_µ in 1e-7 units — no
    * decimal multiply whose half-way rounding can disagree between
    * engines (0.7·0.371485 sits exactly on a 6-dp boundary and DID).
    * Ties break on the smaller id; the greedy trace is engine-exact
    * by construction.
    *
    * Returns (query_id, cand_id, step, score) — score a BIGINT in
    * 1e-7 units of the λ·rel − (1−λ)·maxsim objective.
    */
  def mmrSelect(
      candidates: DataFrame, pairSims: DataFrame, k: Int,
      relTenths: Int = 7, divTenths: Int = 3): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(relTenths >= 0 && divTenths >= 0, "weights must be nonnegative")
    def micro(c: org.apache.spark.sql.Column) =
      round(c * lit(1000000L)).cast("long")
    // the greedy trace runs over BOUNDED frames (per-query top-k in,
    // ≤ |cands|·k sim pairs touched) with exact-integer scores — when
    // a limited probe shows both fit, the whole selection runs on the
    // driver (identical argmax, identical smaller-id tie-break),
    // replacing 2(k−1)+3 checkpoint/job waves with two collects. A
    // corpus-scale query stream exceeds the probe and keeps the
    // distributed loop.
    localMmr(candidates, pairSims, k, relTenths, divTenths) match {
      case Some(out) => return out
      case None      => ()
    }
    val pickW = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    val cands = candidates
      .select(col("query_id"), col("cand_id"), micro(col("rel")).as("_rel"))
      .localCheckpoint(true)
    var selected = cands
      .select(col("query_id"), col("cand_id"),
        (lit(relTenths.toLong) * col("_rel")).as("score"))
      .withColumn("_rk", row_number().over(pickW))
      .filter(col("_rk") === 1)
      .select(col("query_id"), col("cand_id"), lit(1L).as("step"), col("score"))
      .localCheckpoint(true)
    var remaining = cands
      .join(selected.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
      .localCheckpoint(true)
    for (step <- 2 to k) {
      // Pair every remaining candidate with every already-selected item
      // (per-query cross, bounded by |candidates|·k) FIRST, then
      // left-join the similarity rows: a (cand, selected) pair absent
      // from pairSims means similarity 0, not "drop the candidate from
      // the argmax" — callers may legitimately supply sparse sims.
      val next = remaining
        .join(selected.select(col("query_id"), col("cand_id").as("b")),
          Seq("query_id"))
        .join(pairSims.select(col("query_id"), col("a").as("cand_id"),
          col("b"), micro(col("s")).as("_s")),
          Seq("query_id", "cand_id", "b"), "left")
        .groupBy(col("query_id"), col("cand_id"))
        .agg(first(col("_rel")).as("_rel"),
          max(coalesce(col("_s"), lit(0L))).as("_ms"))
        .select(col("query_id"), col("cand_id"),
          (lit(relTenths.toLong) * col("_rel") -
            lit(divTenths.toLong) * col("_ms")).as("score"))
        .withColumn("_rk", row_number().over(pickW))
        .filter(col("_rk") === 1)
        .select(col("query_id"), col("cand_id"), lit(step.toLong).as("step"),
          col("score"))
      selected = selected.unionByName(next).localCheckpoint(true)
      remaining = remaining
        .join(next.select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "left_anti")
        .localCheckpoint(true)
    }
    selected
  }

  /** Driver-local greedy MMR under a size guard; None when the frames
    * exceed the bound or the id types have no natural local ordering.
    */
  private def localMmr(
      candidates: DataFrame, pairSims: DataFrame, k: Int,
      relTenths: Int, divTenths: Int): Option[DataFrame] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val CandBound = 200000
    val SimBound = 1000000
    // smaller-id tie-break needs an ordering on the (opaque) id type
    def orderingOf(dt: DataType): Option[Ordering[Any]] = dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(Ordering.by((v: Any) => v.asInstanceOf[Number].longValue))
      case DoubleType | FloatType =>
        Some(Ordering.by((v: Any) => v.asInstanceOf[Number].doubleValue))
      case StringType => Some(LocalOrder.utf8.on((v: Any) => v.asInstanceOf[String]))
      case _          => None
    }
    val candOrd = orderingOf(candidates.schema("cand_id").dataType).getOrElse(return None)
    // Spark-`round` semantics for the micro scaling
    def microL(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 1000000L).setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val candRows = candidates.select(col("query_id"), col("cand_id"), col("rel").cast("double"))
      .limit(CandBound + 1).collect()
    if (candRows.length > CandBound) return None
    val simRows = pairSims.select(col("query_id"), col("a"), col("b"), col("s").cast("double"))
      .limit(SimBound + 1).collect()
    if (simRows.length > SimBound) return None

    val simsByQuery = simRows.groupBy(_.get(0)).map { case (q, rs) =>
      q -> rs.iterator.map(r => (r.get(1), r.get(2)) -> microL(r.getDouble(3))).toMap
    }
    val out = Vector.newBuilder[Row]
    for ((q, rs) <- candRows.groupBy(_.get(0))) {
      val rel = rs.iterator.map(r => r.get(1) -> microL(r.getDouble(2))).toMap
      val sims = simsByQuery.getOrElse(q, Map.empty[(Any, Any), Long])
      var remaining = rel.keys.toVector
      var selected = Vector.empty[Any]
      var step = 1L
      while (step <= k && remaining.nonEmpty) {
        val scored = remaining.map { c =>
          val ms =
            if (selected.isEmpty) 0L
            else selected.iterator.map(b => sims.getOrElse((c, b), 0L)).max
          c -> (relTenths.toLong * rel(c) - (if (selected.isEmpty) 0L else divTenths.toLong * ms))
        }
        val (best, score) = scored.minBy { case (c, s) => (-s, c) }(
          Ordering.Tuple2(Ordering.Long, candOrd))
        out += Row(q, best, step, score)
        selected :+= best
        remaining = remaining.filterNot(_ == best)
        step += 1
      }
    }
    val spark = candidates.sparkSession
    val schema = StructType(Seq(
      candidates.schema("query_id").copy(name = "query_id"),
      candidates.schema("cand_id").copy(name = "cand_id"),
      StructField("step", LongType, nullable = false),
      StructField("score", LongType, nullable = false)))
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(out.result(), 1), schema))
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
