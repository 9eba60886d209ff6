package graft.operators

import graft.functions.TextFunctions.{langId, tokens}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the KenLM-shaped
  * quality signal (CCNet-style filtering buckets documents by LM
  * perplexity). This is the self-trained variant: the corpus itself
  * supplies the counts, so no external model file is needed and the
  * whole computation is three hash aggregates plus two equi-joins.
  *
  * Scale shape: unigram and bigram count tables are one row per
  * distinct (bi)gram — the heavy frame is the exploded token stream,
  * which shuffles once per count table and once for the score join.
  * The vocabulary-size scalar rides along as a broadcast 1-row frame,
  * never a driver collect.
  */
object LanguageModel {

  /** The (doc, tok, next) stream feeding every LM statistic (`next`
    * is the following token, null for the last token of a document;
    * `zip_with` pads the shifted slice). Each consumer re-derives the
    * stream with an in-flight explode off the shared scan exchange.
    *
    * Round 18: the corpus-sized localCheckpoint of the token arrays
    * is GONE — it serialized the whole pipeline behind one eager
    * write of the tokenized corpus to local disk (a ~0.5 s serial job
    * at sf0.1 and a disk-pressure hazard at scale), purely to share
    * the tokenize between the count aggregate and the score join.
    * Without it both consumers hang off the same scan-side exchange
    * (ReuseExchange), their map stages run CONCURRENTLY under AQE,
    * and the tokenize runs twice as overlapped parallel CPU — the
    * §1.2 trade: duplicated cheap per-task work beats a serial
    * materialization of corpus-sized bytes.
    */
  private def tokenNextPairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(lower(col(textCol))).as("w"))
      .select(col(idCol), explode(zip_with(col("w"),
        slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
        (a, b) => struct(a.as("tok"), b.as("next")))).as("p"))
      .select(col(idCol), col("p.tok").as("tok"), col("p.next").as("next"))

  /** Per-document average negative log-probability under an add-one
    * smoothed bigram model trained on the corpus itself:
    * P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), with c(·) corpus counts
    * over lowercased whitespace tokens and V the distinct-token count.
    * High scores flag improbable token sequences (noise, boilerplate
    * tables, wrong-language spans); near-zero flags verbatim
    * repetition. Documents with fewer than two tokens are not scored.
    *
    * One (tok, next) roll-up supplies BOTH count tables: the unigram
    * count of a token is the sum of its pair counts including the
    * null-next group, so the token stream shuffles once for all
    * statistics and once for the score join.
    *
    * Returns (idCol, n_bigrams, avg_neg_logprob) with the score
    * rounded to 4 decimals (deterministic cross-engine).
    */
  def bigramNegLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = tokenNextPairs(df, idCol, textCol)
    val pairCounts = exploded.groupBy(col("tok"), col("next"))
      .agg(count(lit(1)).as("c12"))
    val uni = pairCounts.groupBy(col("tok")).agg(sum(col("c12")).as("c1"))
    val bi = pairCounts.filter(col("next").isNotNull)
    // vocabulary size from the unigram frame — no extra corpus scan
    val v = uni.agg(count(lit(1)).as("v"))
    // per-distinct-bigram score table: the count joins run over the
    // vocab-sized frames (|distinct bigrams| rows), so the corpus-
    // sized token stream shuffles ONCE for the score join instead of
    // once per count table — the same stream-joins-the-model-not-the-
    // counts shape as the naive-bayes scorer. -ln(p) is computed once
    // per distinct bigram from the identical c12/c1/v integers, so
    // per-occurrence values are bit-identical to the inline form.
    val score = bi
      .join(uni, Seq("tok"))
      .crossJoin(broadcast(v))
      .select(col("tok"), col("next"),
        (-log((col("c12") + 1.0) / (col("c1") + col("v")))).as("_nl"))
    exploded.filter(col("next").isNotNull)
      .join(score, Seq("tok", "next"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("_nl")), 4).as("avg_neg_logprob"))
  }

  /** Top-k collocations by pointwise mutual information:
    * PMI(w1,w2) = ln( (c12/N_bi) / ((c1/N_uni)·(c2/N_uni)) ) — bigrams
    * whose components co-occur far more than independence predicts
    * (multi-word entities, idioms; the classic phrase-mining signal).
    * `minCount` floors c12 so rare-pair noise (which maximizes raw
    * PMI) is excluded. Ties at equal rounded PMI break on (w1, w2).
    * Two count aggregates + one broadcast of corpus totals; the join
    * back to unigram counts touches only the ≥minCount bigrams.
    */
  def pmiCollocations(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, "minCount must be at least 1")
    require(k >= 1, "k must be at least 1")
    val toks = df.select(col(idCol), tokens(lower(col(textCol))).as("w"))
    val bigrams = toks.filter(size(col("w")) >= 2)
      .select(explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val bi = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val totals = uni.agg(sum(col("c")).as("n_uni"))
      .crossJoin(bigrams.groupBy().agg(count(lit(1)).as("n_bi")))
    bi
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(
        col("w1"), col("w2"), col("c12"),
        round(
          log((col("c12").cast("double") / col("n_bi")) /
            ((col("c1").cast("double") / col("n_uni")) *
              (col("c2").cast("double") / col("n_uni")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Jelinek-Mercer interpolated bigram scoring:
    * P(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N — the smoothing
    * family a KenLM-style filter actually ships (add-one is the
    * pedagogical baseline; interpolation backs off gracefully to the
    * unigram for unseen continuations instead of flattening the whole
    * distribution). λ defaults to 1/2, an exact dyadic double.
    *
    * Same scale shape as [[bigramNegLogProb]]: two count aggregates,
    * the corpus-total scalar as a broadcast 1-row frame, one score
    * join. Returns (idCol, n_bigrams, avg_neg_logprob r4); documents
    * with fewer than two tokens are not scored.
    */
  def interpolatedNegLogProb(
      df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.5): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0, 1)")
    val exploded = tokenNextPairs(df, idCol, textCol)
    val pairCounts = exploded.groupBy(col("tok"), col("next"))
      .agg(count(lit(1)).as("c12"))
    val uni = pairCounts.groupBy(col("tok")).agg(sum(col("c12")).as("c"))
    val bi = pairCounts.filter(col("next").isNotNull)
    val n = uni.agg(sum(col("c")).as("n"))
    // per-distinct-bigram score table (see [[bigramNegLogProb]]): the
    // c1/c2 joins run over the vocab-sized bigram frame, and the
    // corpus-sized stream shuffles once for the score join instead of
    // three times (on (tok,next), tok, next). -ln(p) per distinct
    // bigram uses the identical c12/c1/c2/n values, so per-occurrence
    // scores are bit-identical to the inline form.
    val score = bi
      .join(uni.select(col("tok"), col("c").as("c1")), Seq("tok"))
      .join(uni.select(col("tok").as("next"), col("c").as("c2")), Seq("next"))
      .crossJoin(broadcast(n))
      .select(col("tok"), col("next"),
        (-log(
          lit(lambda) * col("c12").cast("double") / col("c1") +
            lit(1 - lambda) * col("c2").cast("double") / col("n"))).as("_nl"))
    exploded.filter(col("next").isNotNull)
      .join(score, Seq("tok", "next"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(col("_nl")), 4).as("avg_neg_logprob"))
  }

  /** CCNet-style perplexity bucketing: score every document with the
    * corpus-trained bigram LM, then split the corpus at the 1/3 and
    * 2/3 score quantiles into head / middle / tail quality buckets
    * (Wenzek et al. 2020 keep head+middle, drop tail). Thresholds are
    * exact interpolated quantiles rounded to 6 and BROADCAST, so
    * bucket assignment is a narrow comparison riding the scored
    * frame — no global ntile sort (the equal-count formulation needs a
    * single-partition window; the threshold formulation is the
    * 100 TB shape and both engines replay it identically).
    *
    * Returns one row per bucket: (bucket, n_docs, min_nlp, max_nlp).
    */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String,
      maxLocalDocs: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    val scores = bigramNegLogProb(df, idCol, textCol)
      .select(col(idCol), col("avg_neg_logprob").as("nlp"))
    // the per-doc score frame is one small row per document — when it
    // fits a bounded collect (limit-probe; a 100 TB corpus with
    // billions of documents keeps the distributed tail), the quantile
    // thresholds and the bucket roll-up run on the driver with the
    // SAME arithmetic as the distributed tail: Percentile-style
    // interpolation (wl·lo + wh·hi on p·(n−1)) and Spark-`round`
    // semantics (BigDecimal.valueOf, HALF_UP), so both paths agree.
    val probe = scores.select(col("nlp")).limit(maxLocalDocs + 1).collect()
    if (maxLocalDocs > 0 && probe.length <= maxLocalDocs) {
      import spark.implicits._
      def rnd(x: Double, s: Int): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
      val vs = probe.map(_.getDouble(0)).sorted
      if (vs.isEmpty)
        return Seq.empty[(String, Long, Double, Double)]
          .toDF("bucket", "n_docs", "min_nlp", "max_nlp")
      def pct(p: Double): Double = {
        val pos = p * (vs.length - 1).toDouble
        val wl = math.ceil(pos) - pos
        val wh = pos - math.floor(pos)
        if (wh == 0.0) vs(math.floor(pos).toInt)
        else wl * vs(math.floor(pos).toInt) + wh * vs(math.ceil(pos).toInt)
      }
      val t1 = rnd(pct(1.0 / 3), 6)
      val t2 = rnd(pct(2.0 / 3), 6)
      val out = vs.groupBy(v =>
        if (v <= t1) "head" else if (v <= t2) "middle" else "tail")
        .map { case (b, xs) => (b, xs.length.toLong, rnd(xs.min, 4), rnd(xs.max, 4)) }
        .toSeq
      return spark.createDataset(out).toDF("bucket", "n_docs", "min_nlp", "max_nlp")
    }
    // distributed tail: materialize the per-doc scores (the quantile
    // pass and the bucket-assignment pass otherwise each re-execute
    // the full LM scoring pipeline — tokenize + two count aggregates
    // + the score join — doubling the corpus work)
    val scored = scores.withColumn("_g", lit(1)).localCheckpoint(true)
    val th = Quantiles
      .groupPercentiles(scored, "_g", "nlp", Seq("t1" -> 1.0 / 3, "t2" -> 2.0 / 3))
      .select(round(col("t1"), 6).as("t1"), round(col("t2"), 6).as("t2"))
    scored.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("nlp") <= col("t1"), "head")
          .when(col("nlp") <= col("t2"), "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("nlp")), 4).as("min_nlp"),
        round(max(col("nlp")), 4).as("max_nlp"))
  }

  /** Code-switch profile: language-ID every `windowTokens`-token
    * window of a document and report how many windows, how many
    * distinct predicted languages, and how often consecutive windows
    * switch — mixed-language documents (the curation case for
    * splitting or routing, invisible to whole-doc language ID) score
    * n_langs > 1 / switches > 0.
    *
    * Narrow until the final per-doc aggregate: windows are array
    * slices of the one tokenization, language ID is the pure marker
    * CASE chain ([[graft.functions.TextFunctions.langId]]), and the
    * switch count is a per-doc window lag — one shuffle on the doc id.
    */
  def codeSwitchProfile(
      df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 20): DataFrame = {
    require(windowTokens >= 1)
    val nChunks = greatest((size(col("_w")) + (windowTokens - 1))
      .divide(windowTokens).cast("int"), lit(1))
    val t = df.select(col(idCol), tokens(trim(col(textCol))).as("_w"))
      .select(col(idCol), col("_w"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        langId(concat_ws(" ",
          slice(col("_w"), col("chunk_idx") * windowTokens + 1, lit(windowTokens))))
          .as("_wl"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("chunk_idx"))
    t.withColumn("_prev", lag(col("_wl"), 1).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_windows"),
        countDistinct(col("_wl")).as("n_langs"),
        sum(when(col("_prev").isNotNull && col("_prev") =!= col("_wl"), 1L)
          .otherwise(0L)).as("switches"))
  }
}
