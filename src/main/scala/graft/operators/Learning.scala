package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed model-fitting and evaluation primitives for quality
  * classifiers over training corpora (reference: the pipeline's
  * quality gates in main.py delegate scoring to fixed rules; these
  * are the learned-score counterparts a 100 TB curation run needs).
  *
  * Everything is expressed as relational plans: features live as
  * (row, dim, value) triples, weights as a dim-indexed frame that is
  * broadcast back onto the data each step. No vector is ever
  * collected to the driver; per-iterate rounding (6 dp) makes every
  * step exactly replayable in DuckDB SQL, which is how the oracle
  * certifies the math.
  */
object Learning {

  /** Batch logistic regression by `iters` full-gradient steps.
    *
    * Input: `vecCol: array<float|double>` features (the first
    * `nDims` entries are used), `labelCol` a 0/1 integer. A bias
    * term is appended as dim = nDims with x = 1. Weights start at 0,
    * so iterate 1 is deterministic; each weight update rounds to
    * 6 dp (cross-engine exact replay), and the per-row margin rounds
    * to 6 dp before the sigmoid so engines agree on p.
    *
    * Scale shape: one narrow posexplode of the feature slice, one
    * broadcast join of the (nDims+1)-row weight frame per step, one
    * partial-agg'd gradient per step. The corpus is scanned once per
    * iteration — the textbook distributed GD plan.
    *
    * Returns (dim, weight, accuracy): the final weights plus the
    * training accuracy (p >= 0.5 predicts 1) rounded to 4.
    */
  /** Spark's `round` semantics on a driver double: shortest decimal
    * form (BigDecimal.valueOf), scale HALF_UP.
    */
  private def rnd(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared GD loop: (per-row sigmoid scorer, final weights). The
    * weight vector is (nDims+1) doubles — broadcast-sized by
    * definition — so it lives on the driver and is inlined into each
    * pass as a literal array: one job per iteration (gradient
    * partial-agg + (nDims+1)-row collect), no weight-frame
    * checkpoints, no broadcast builds. The per-row margin is an
    * IN-ROW dot product rounded to 6 dp before the sigmoid, and each
    * weight update rounds to 6 dp with Spark-`round` semantics, so
    * engines agree on every iterate.
    */
  private def trainGD(
      df: DataFrame, vecCol: String, labelCol: String,
      nDims: Int, iters: Int, lr: Double,
      keepCols: Seq[String] = Nil): (Array[Double] => DataFrame, Array[Double]) = {
    require(nDims >= 1 && iters >= 1, "need nDims >= 1 and iters >= 1")
    val rows = df.select(keepCols.map(col) ++ Seq(
      col(labelCol).cast("double").as("_y"),
      concat(slice(col(vecCol).cast("array<double>"), 1, nDims), array(lit(1.0)))
        .as("_xs")): _*)
      .localCheckpoint(true)
    val n = rows.count().toDouble
    def margins(w: Array[Double]) = {
      val wLit = array(w.map(lit(_)): _*)
      rows
        .select(keepCols.map(col) ++ Seq(col("_y"), col("_xs"),
          round(aggregate(zip_with(col("_xs"), wLit, (x, wv) => x * wv),
            lit(0.0), (acc, v) => acc + v), 6).as("m")): _*)
        .select(keepCols.map(col) ++ Seq(col("_y"), col("_xs"),
          (lit(1.0) / (lit(1.0) + exp(-col("m")))).as("p")): _*)
    }
    graft.functions.GraftFunctions.register(df.sparkSession)
    val w = Array.fill(nDims + 1)(0.0)
    for (_ <- 1 to iters) {
      // gradient: ONE fused weighted-vector-sum aggregate — corpus
      // vector-FMAs into an (nDims+1)-double partial per partition
      // instead of corpus×dims rows through posexplode + hash
      // aggregation (round 17, guide §2.3/§4). Same per-dim product
      // multiset and the same sum-then-divide arithmetic; addition
      // order is absorbed by the round-6 weight update exactly as the
      // engine-order difference already was. A dim whose every
      // product is null keeps a null slot (the old all-null group) and
      // is skipped, as the old collect loop never updated a dim it
      // could not read.
      val gRow = margins(w)
        .select(col("_xs"), (col("p") - col("_y")).as("_r"))
        .agg(graft.functions.GraftFunctions.vecWeightedSum(
          col("_xs"), col("_r")).as("_g"))
        .collect()(0)
      if (!gRow.isNullAt(0)) {
        gRow.getSeq[Any](0).zipWithIndex.foreach {
          case (g, dim) if g != null && dim <= nDims =>
            w(dim) = rnd(w(dim) - lr * (g.asInstanceOf[Double] / n), 6)
          case _ => ()
        }
      }
    }
    (margins, w)
  }

  def logisticRegressionGD(
      df: DataFrame, vecCol: String, labelCol: String,
      nDims: Int, iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (margins, w) = trainGD(df, vecCol, labelCol, nDims, iters, lr)
    val scored = margins(w)
    if (scored.isEmpty)
      return Seq.empty[(Long, Double, Double)].toDF("dim", "weight", "accuracy")
    val acc = scored
      .agg(round(avg(when((col("p") >= 0.5) === (col("_y") > 0.5), 1.0)
        .otherwise(0.0)), 4).as("accuracy"))
    spark.createDataset(w.toSeq.zipWithIndex.map { case (wt, d) => (d.toLong, wt) })
      .toDF("dim", "weight")
      .crossJoin(broadcast(acc))
      .select(col("dim"), col("weight"), col("accuracy"))
  }

  /** Per-row predictions (y, p) of the trained model — the input to
    * calibration and threshold analysis.
    */
  def logisticPredict(
      df: DataFrame, vecCol: String, labelCol: String,
      nDims: Int, iters: Int = 3, lr: Double = 0.5,
      keepCols: Seq[String] = Nil): DataFrame = {
    val (margins, w) = trainGD(df, vecCol, labelCol, nDims, iters, lr, keepCols)
    margins(w).select(keepCols.map(col) :+ col("_y").as("y") :+ col("p"): _*)
  }

  /** Reliability diagram: predictions bucketed into `bins` equal-width
    * probability bins (floor(p·bins), top-clamped), each with its
    * count, mean predicted probability, and empirical positive rate —
    * the calibration check a learned quality filter needs before its
    * scores gate data. One groupBy, rounds to 6.
    */
  def calibrationBins(
      preds: DataFrame, probCol: String, labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "need bins >= 2")
    preds.filter(col(probCol).isNotNull).select(
      least(floor(col(probCol) * bins), lit(bins - 1)).cast("long").as("bin"),
      col(probCol).cast("double").as("_p"), col(labelCol).cast("double").as("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("_p")), 6).as("mean_p"),
        round(avg(col("_y")), 6).as("frac_pos"))
  }

  /** Brier score with the Murphy (1973) decomposition: the proper
    * scoring rule avg((p−y)²) split into
    * reliability (miscalibration, Σ n_k(p̄_k−ō_k)²/N — lower better)
    * − resolution (discrimination, Σ n_k(ō_k−ō)²/N — higher better)
    * + uncertainty (ō(1−ō), data-inherent). Bins follow
    * [[calibrationBins]]; one pass for the score, one tiny bin
    * aggregation for the decomposition. Returns one row
    * (brier, reliability, resolution, uncertainty), rounded 6.
    */
  def brierDecomposition(
      preds: DataFrame, probCol: String, labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2, "need bins >= 2")
    val scored = preds.filter(col(probCol).isNotNull).select(
      least(floor(col(probCol) * bins), lit(bins - 1)).cast("long").as("bin"),
      col(probCol).cast("double").as("_p"), col(labelCol).cast("double").as("_y"))
      .localCheckpoint(true)
    val brier = scored.agg(
      round(avg(pow(col("_p") - col("_y"), 2)), 6).as("brier"),
      avg(col("_y")).as("_obar"), count(lit(1)).as("_n"))
    val binStats = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"), avg(col("_p")).as("pbar"), avg(col("_y")).as("obar_k"))
    binStats.crossJoin(broadcast(brier))
      .agg(
        max(col("brier")).as("brier"),
        round(sum(col("nk") * pow(col("pbar") - col("obar_k"), 2)) / max(col("_n")), 6)
          .as("reliability"),
        round(sum(col("nk") * pow(col("obar_k") - col("_obar"), 2)) / max(col("_n")), 6)
          .as("resolution"),
        round(max(col("_obar")) * (lit(1.0) - max(col("_obar"))), 6).as("uncertainty"))
  }

  /** Chi-squared association between item presence and a class column
    * over (item, cls) presence pairs (one row per item x document).
    * `clsTotals` = (cls, n_cls) document counts. For each item the
    * 2 x K contingency table (present/absent x class) is reduced to
    * chi2 = sum (O-E)^2/E via the class marginals — one groupBy over
    * the pairs plus a broadcast of the K-row totals; the full table
    * is never materialized.
    *
    * Contract (round 17 change): only pairs whose `cls` appears in
    * `clsTotals` contribute, and an item whose occurrences are ALL in
    * classes absent from `clsTotals` (including a null cls, which
    * never equi-joins) emits NO row. The pre-round-17 shape emitted
    * such items as an all-zero row (r1 = 0 → e1 = 0 → 0/0 = NaN chi2,
    * doc_freq 0) because its item universe was built before class
    * filtering; dropping them is the deliberate behavior — a NaN-chi2
    * row carries no information and every engine formats NaN
    * differently. Unreachable for q135 (pairs.cls and clsTotals.cls
    * derive from the same `documents.source`).
    */
  def chi2Presence(pairs: DataFrame, clsTotals: DataFrame): DataFrame = {
    // Round-17 reshape (guide §2.4): the old item-universe crossJoin →
    // left-join → r1 re-aggregation → final chi2 aggregation walked
    // the vocab-sized frame through FOUR more exchanges (distinct,
    // join, r1, final groupBy) plus a vocab-sized r1 broadcast. The
    // 2×K table of one item is K cells with K small — so after ONE
    // (item, cls) count and ONE item-keyed fold of the per-class
    // counts into a map, the chi2 is an IN-ROW fold over the broadcast
    // K-row class totals (absent classes read o1 = 0 via the map
    // lookup, exactly like the old coalesced left join). Same cell
    // terms, same e1/e0 arithmetic; only the K-term addition order is
    // fixed (class-sorted) instead of join-order-arbitrary, which
    // round-6 absorbs exactly as it absorbs the DuckDB order. The
    // class semi-join means only clsTotals' classes contribute — see
    // the scaladoc for the one observable divergence from the old
    // shape (items occurring ONLY under unknown/null classes are
    // dropped instead of emitted as NaN rows).
    val present = pairs
      .join(broadcast(clsTotals.select(col("cls"))), Seq("cls"))
      .groupBy(col("item"), col("cls"))
      .agg(count(lit(1)).as("o1"))
    // K class totals + the grand total as ONE broadcast row
    val tots = clsTotals.agg(
      array_sort(collect_list(struct(col("cls"), col("n_cls")))).as("_ts"),
      sum(col("n_cls")).as("nn"))
    val cell = (acc: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) => {
      val nCls = t.getField("n_cls")
      val o1 = coalesce(element_at(col("_m"), t.getField("cls")), lit(0L))
      val e1 = nCls * col("r1") / col("nn")
      val e0 = nCls * (col("nn") - col("r1")) / col("nn")
      acc + pow(o1 - e1, 2) / e1 + pow(nCls - o1 - e0, 2) / e0
    }
    present.groupBy(col("item"))
      .agg(
        map_from_entries(collect_list(struct(col("cls"), col("o1")))).as("_m"),
        sum(col("o1")).as("r1"))
      .crossJoin(broadcast(tots))
      // an item present in EVERY document has e0 = 0 (chi2 undefined)
      .filter(col("r1") < col("nn"))
      .select(col("item"),
        round(aggregate(col("_ts"), lit(0.0), cell), 6).as("chi2"),
        col("r1").as("doc_freq"))
  }

  /** Entropy of a binary rate p, in nats, with the 0·ln0 = 0
    * convention at the degenerate ends.
    */
  private def binEntropy(p: org.apache.spark.sql.Column) =
    when(p <= 0.0 || p >= 1.0, 0.0)
      .otherwise(-(p * log(p) + (lit(1.0) - p) * log(lit(1.0) - p)))

  /** Best decision-stump split per feature dimension: for each dim of
    * the (sliced) feature vector, the threshold maximizing information
    * gain of `x <= t` against a binary label, over candidate
    * thresholds = the 1-dp-rounded observed values.
    *
    * Shape: posexplode to (dim, t, y) counts (ONE partial-agg'd
    * groupBy — candidates collapse here), cumulative windows per dim
    * give every split's left/right class counts at once, and the
    * argmax is a per-dim row_number — no per-threshold rescan of the
    * corpus, the classic histogram split-finder of distributed GBDTs.
    *
    * Returns (dim, threshold, gain, n_left, n_right); gain rounds to
    * 6, ties break on the smaller threshold.
    */
  def bestStumpSplits(
      df: DataFrame, vecCol: String, labelCol: String, nDims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nDims >= 1, "need nDims >= 1")
    val counts = df.select(col(labelCol).cast("double").as("_y"),
      posexplode(slice(col(vecCol).cast("array<double>"), 1, nDims))
        .as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"), round(col("x"), 1).as("t"))
      .agg(count(lit(1)).as("c"), sum(col("_y")).as("pos"))
    val w = Window.partitionBy(col("dim")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("dim"))
    val splits = counts
      .withColumn("nl", sum(col("c")).over(w))
      .withColumn("posl", sum(col("pos")).over(w))
      .withColumn("n", sum(col("c")).over(tot))
      .withColumn("post", sum(col("pos")).over(tot))
      .filter(col("nl") < col("n")) // a split must leave a right side
      .select(col("dim"), col("t"), col("nl"), col("n"),
        (col("n") - col("nl")).as("nr"),
        binEntropy(col("post") / col("n")).as("hp"),
        binEntropy(col("posl") / col("nl")).as("hl"),
        binEntropy((col("post") - col("posl")) / (col("n") - col("nl"))).as("hr"))
      .select(col("dim"), col("t"), col("nl"), col("nr"),
        round(col("hp") - (col("nl") / col("n")) * col("hl")
          - (col("nr") / col("n")) * col("hr"), 6).as("gain"))
    val pick = Window.partitionBy(col("dim"))
      .orderBy(col("gain").desc, col("t"))
    splits.withColumn("_rk", row_number().over(pick))
      .filter(col("_rk") === 1)
      .select(col("dim"), col("t").as("threshold"), col("gain"),
        col("nl").as("n_left"), col("nr").as("n_right"))
  }

  /** Multinomial Naive Bayes with add-one smoothing, trained and
    * resubstitution-scored in one relational pipeline: per-(token,
    * class) counts → smoothed log-likelihoods over the full
    * vocabulary × class grid (zero counts included), documents scored
    * by one token join + one (doc, class) aggregation, predictions by
    * per-doc argmax (rounded 6, lexicographic tie-break).
    *
    * Returns the confusion matrix (cls, pred, n). Training is ONE
    * job: each document emits a marker pseudo-token ahead of its real
    * tokens, so the (tok, cls) roll-up carries the model's nonzero
    * counts AND — via the marker rows — the per-class document counts
    * the priors need; a limited collect probes whether that roll-up
    * is broadcast-sized (LocalLimit short-circuits on an open 100 TB
    * vocabulary). When it is, scoring, argmax, and the confusion
    * count collapse into a second single-shuffle job; otherwise the
    * scale-safe shuffle-join paths take over.
    */
  def naiveBayesConfusion(
      docs: DataFrame, idCol: String, textCol: String, clsCol: String,
      maxLocalNonzero: Int = 300000, maxVectorClasses: Int = 64): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val spark = docs.sparkSession
    import spark.implicits._
    // tokens() splits on \s+, so no real token can ever contain a
    // space — a marker with one cannot collide
    val docMark = " doc"
    // labels are compared as strings throughout (both branches collect
    // them on the driver via getString; a non-string class column —
    // e.g. an int label — must not ClassCastException there)
    val clsExpr = col(clsCol).cast("string").as("cls")
    // Tokenize is CPU-per-row and its parallelism is the input's
    // split count — narrow scans are the CALLER's concern
    // (Tables.documents already spreads a few-split testdata file
    // across the cores; a 100 TB scan has more splits than cores).
    val raw = docs.select(col(idCol).as("_id"), clsExpr, col(textCol).as("_text"))
    // the coalesce keeps the marker row for null-text documents: they
    // score nothing but still count toward their class's prior,
    // exactly like the docs-table count the priors used to make
    val tokCls = raw.select(col("cls"),
      explode(concat(array(lit(docMark)),
        coalesce(tokens(lower(col("_text"))), array()))).as("tok"))
      .groupBy(col("tok"), col("cls")).agg(count(lit(1)).as("c"))
    val probeAll = tokCls.limit(maxLocalNonzero + 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val (markRows, probe) = probeAll.partition(_._1 == docMark)
    val localFits = probeAll.length <= maxLocalNonzero && {
      val v0 = probe.iterator.map(_._1).toSet.size.toLong
      val k0 = probe.iterator.map(_._2).toSet.size.toLong
      v0 * k0 <= 1000000L
    }
    val localClasses =
      if (localFits) probe.map(_._2).distinct.sorted else Array.empty[String]
    lazy val docToks = raw.select(col("_id"), col("cls"),
      explode(tokens(lower(col("_text")))).as("tok"))
      .groupBy(col("_id"), col("cls"), col("tok"))
      .agg(count(lit(1)).as("_cnt"))
    if (localFits && localClasses.nonEmpty &&
      localClasses.length <= maxVectorClasses) {
      // the model is closed AND the class list is short, so the whole
      // score→argmax→confusion chain is one job over a second corpus
      // pass with a single real shuffle and NO fan-out: each token
      // instance hash-joins its K-vector of log-likelihoods (one
      // broadcast row per distinct token, same (c+1)/(tt+V)
      // arithmetic as the distributed grid), per-doc class scores are
      // K element-wise sums that partial-aggregate map-side, the
      // argmax is an in-row array_min over (−rounded score, class)
      // structs (same max-score, smaller-class tie-break as the
      // min_by form), and the final (cls, pred) count is a K²-sized
      // aggregate. The scoring pass re-emits the marker token per
      // doc, and the marker's "log-likelihood vector" IS the prior
      // vector — the per-doc sums then include the prior with no
      // per-class double literal in the plan, so the generated code
      // is identical across corpora and the codegen cache survives a
      // scale switch (a literal-prior plan recompiled ~0.35 s on
      // every new corpus).
      val vocab = probe.map(_._1).distinct
      val v = vocab.length.toLong
      val tt = probe.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._3).sum }
      val nz = probe.map { case (t, c, n) => (t, c) -> n }.toMap
      val lpriorOf = markRows.map(t => (t._2, t._3)).toMap
      val nDocsTotal = markRows.map(_._3).sum
      val tokLls = (docMark, localClasses.toSeq.map(c =>
        math.log(lpriorOf(c).toDouble / nDocsTotal.toDouble))) +:
        vocab.toSeq.map { t =>
          (t, localClasses.toSeq.map(c =>
            math.log((nz.getOrElse((t, c), 0L) + 1.0) / (tt(c) + v.toDouble))))
        }
      val lls = broadcast(spark.createDataset(tokLls).toDF("tok", "_lls"))
      val sums = localClasses.indices.map { i =>
        sum(element_at(col("_lls"), i + 1)).as(s"_s$i")
      }
      val cand = array(localClasses.zipWithIndex.map { case (c, i) =>
        struct((-round(col(s"_s$i"), 6)).as("negscore"), lit(c).as("scls"))
      }.toIndexedSeq: _*)
      // no coalesce around tokens() here: a null-text document
      // contributes no row (the concat is null), so it is excluded
      // from scoring exactly like the oracle's token join excludes it
      raw.select(col("_id"), col("cls"),
        explode(concat(array(lit(docMark)),
          tokens(lower(col("_text"))))).as("tok"))
        .join(lls, Seq("tok"))
        .groupBy(col("_id"), col("cls"))
        .agg(sums.head, sums.tail: _*)
        .select(col("cls"), array_min(cand).getField("scls").as("pred"))
        .groupBy(col("cls"), col("pred"))
        .agg(count(lit(1)).as("n"))
    } else if (localFits) {
      // closed model, wide class list: driver-built broadcast grid,
      // scored through the grouped (doc, class) aggregate below (the
      // grid join fans out K× per row, so score off the per-doc token
      // MULTIPLICITIES, not raw instances)
      val vocab = probe.map(_._1).distinct
      val v = vocab.length.toLong
      val tt = probe.groupBy(_._2).map { case (c, rs) => c -> rs.map(_._3).sum }
      val nz = probe.map { case (t, c, n) => (t, c) -> n }.toMap
      val cells = for { t <- vocab.toSeq; (c, ttc) <- tt.toSeq }
        yield (t, c, nz.getOrElse((t, c), 0L), ttc)
      val grid = broadcast(spark.createDataset(cells).toDF("tok", "scls", "c", "tt")
        .select(col("tok"), col("scls"),
          log((col("c") + lit(1.0)) / (col("tt") + lit(v.toDouble))).as("ll")))
      val nDocsTotal = markRows.map(_._3).sum
      val prior = spark.createDataset(markRows.toSeq.map(t => (t._2, t._3)))
        .toDF("cls", "nd")
        .select(col("cls"), log(col("nd") / lit(nDocsTotal.toDouble)).as("lprior"))
      scoreAndConfuse(docToks, grid, prior)
    } else {
      // scale path: the probe overflowed (so the marker rows may be
      // incomplete — recount priors from the docs table) and the
      // model grid stays distributed. Materialize the per-doc token
      // multiplicities once: they feed the (tok, cls) roll-up, the
      // stats action, two grid joins, and scoring.
      val docToksD = docToks.localCheckpoint(true)
      val clsDocsRows = docs.groupBy(clsExpr)
        .agg(count(lit(1)).as("nd"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val nDocsTotal = clsDocsRows.map(_._2).sum
      val prior = spark.createDataset(clsDocsRows.toSeq).toDF("cls", "nd")
        .select(col("cls"), log(col("nd") / lit(nDocsTotal.toDouble)).as("lprior"))
      val tokClsD = docToksD.groupBy(col("tok"), col("cls"))
        .agg(sum(col("_cnt")).as("c"))
        .localCheckpoint(true)
      val clsTok = tokClsD.groupBy(col("cls")).agg(sum(col("c")).as("tt"))
      val stats = tokClsD.agg(
        countDistinct(col("tok")).as("v"), countDistinct(col("cls")).as("k")).head()
      val (v, k) = (stats.getLong(0), stats.getLong(1))
      val grid0 = tokClsD.select(col("tok")).distinct()
        .crossJoin(broadcast(clsTok))
        .join(tokClsD, Seq("tok", "cls"), "left")
        .select(col("tok"), col("cls").as("scls"),
          log((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("tt") + lit(v.toDouble)))
            .as("ll"))
      val grid = if (v * k <= 2000000L) broadcast(grid0) else grid0
      scoreAndConfuse(docToksD, grid, prior)
    }
  }

  /** Score a (doc, class, token, count) stream against a (tok, scls,
    * ll) grid and roll up the confusion matrix. The joined stream is
    * |distinct doc-token pairs| × K, never |token instances| × K; the
    * logprob contribution is cnt · ll (same sum, 6-dp rounding absorbs
    * the order). The per-doc argmax is a hash aggregate, not a
    * window: min_by over (−score, scls) is max score with the
    * lexicographic tie-break, and skips the window's per-partition
    * sort entirely.
    */
  private def scoreAndConfuse(
      docToks: DataFrame, grid: DataFrame, prior: DataFrame): DataFrame = {
    val scores = docToks
      .join(grid, Seq("tok"))
      .groupBy(col("_id"), col("cls"), col("scls"))
      .agg(sum(col("_cnt") * col("ll")).as("_s"))
      .join(broadcast(prior.select(col("cls").as("scls"), col("lprior"))), Seq("scls"))
      .select(col("_id"), col("cls"), col("scls"),
        round(col("_s") + col("lprior"), 6).as("score"))
    scores.groupBy(col("_id"), col("cls"))
      .agg(min_by(col("scls"), struct(-col("score"), col("scls"))).as("pred"))
      .groupBy(col("cls"), col("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Split-conformal calibration (Vovk et al. / Lei et al.): from a
    * calibration frame of nonconformity scores, the distribution-free
    * threshold q̂ = the ⌈(n+1)(1−α)⌉-th smallest score, and the
    * coverage that threshold actually achieves on a test frame
    * (≥ 1−α in expectation, regardless of the score's distribution).
    *
    * One sort-rank over the calibration scores picks the order
    * statistic (a global top-⌈…⌉ — range-partitioned sort at scale),
    * then the broadcast 1-row threshold scores the test side in a
    * narrow pass. Returns (n_cal, n_test, qhat, coverage), rounded 6.
    */
  def splitConformal(
      cal: DataFrame, test: DataFrame, scoreCol: String,
      alpha: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, "need 0 < alpha < 1")
    // materialize the (small, calibration-sized) score frame first:
    // the count and the order-statistic window then both read the
    // checkpoint instead of re-executing an arbitrarily expensive
    // upstream (e.g. a full model-scoring pipeline) twice
    val calS = cal.select(round(col(scoreCol).cast("double"), 6).as("_s"))
      .localCheckpoint(true)
    val n = calS.count()
    require(n >= 1, "conformal calibration needs at least one score")
    val k = math.min(n, math.ceil((n + 1) * (1 - alpha)).toLong)
    val qhat = calS
      .withColumn("_rk", row_number().over(Window.orderBy(col("_s"))))
      .filter(col("_rk") === k)
      .select(col("_s").as("qhat"), lit(n).as("n_cal"))
    test.select(round(col(scoreCol).cast("double"), 6).as("_s"))
      .crossJoin(broadcast(qhat))
      .agg(
        max(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        max(col("qhat")).as("qhat"),
        round(avg(when(col("_s") <= col("qhat"), 1.0).otherwise(0.0)), 6)
          .as("coverage"))
      .select(col("n_cal"), col("n_test"), col("qhat"), col("coverage"))
  }

  /** Mutual information (nats) between two categorical columns, plus
    * both marginal entropies: MI = sum p(a,b) ln(p(a,b)/(p(a)p(b))).
    * One joint groupBy; marginals re-aggregate the (tiny) joint frame
    * and broadcast back. Returns one row (mi, h_a, h_b), rounded 6.
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val joint = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c")).localCheckpoint(true)
    val n = joint.agg(sum(col("c")).as("n"))
    val ma = joint.groupBy(col("a")).agg(sum(col("c")).as("ca"))
    val mb = joint.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val mi = joint.join(broadcast(ma), "a").join(broadcast(mb), "b")
      .crossJoin(broadcast(n))
      .agg(round(sum((col("c") / col("n")) *
        log(col("c") * col("n") / (col("ca") * col("cb")))), 6).as("mi"))
    val ha = ma.crossJoin(broadcast(n))
      .agg(round(-sum((col("ca") / col("n")) * log(col("ca") / col("n"))), 6).as("h_a"))
    val hb = mb.crossJoin(broadcast(n))
      .agg(round(-sum((col("cb") / col("n")) * log(col("cb") / col("n"))), 6).as("h_b"))
    mi.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
  }

  /** AUC of a score against a binary label by the Mann-Whitney
    * rank-sum identity: AUC = (R_pos - nPos(nPos+1)/2) / (nPos·nNeg),
    * with tied scores receiving their average rank (the standard
    * tie-corrected estimator, equal to P(score_pos > score_neg) +
    * P(=)/2).
    *
    * Ranks come from one global sort (row_number over score) with the
    * tie-average computed per score group — two window passes, no
    * join. At 100 TB a global sort-rank is a range-partitioned
    * sort — exactly what Spark's window on an unpartitioned ORDER BY
    * plans — so this stays a two-stage job.
    *
    * Returns one row (auc, n_pos, n_neg), auc rounded to 6.
    */
  def aucRankSum(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // null scores are EXCLUDED (engines disagree on null sort order,
    // and an unscored row has no rank) — same policy as ksTwoSample
    val ranked = df.filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("int").as("y"))
      .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
      .withColumn("r", avg(col("rn")).over(Window.partitionBy(col("s"))))
    ranked.agg(
      sum(when(col("y") === 1, col("r"))).as("_rpos"),
      sum(when(col("y") === 1, 1L)).as("n_pos"),
      sum(when(col("y") =!= 1, 1L)).as("n_neg"))
      .select(
        round((col("_rpos") - col("n_pos") * (col("n_pos") + 1) / lit(2.0)) /
          (col("n_pos") * col("n_neg")), 6).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic between the value
    * distributions of two groups: D = max over observed values of
    * |F_a(x) - F_b(x)| — the standard nonparametric drift alarm
    * between two corpus snapshots or sources.
    *
    * Shape: collapse to per-(value) group counts (ONE partial-agg'd
    * groupBy — ties collapse here, so the running sums are exact at
    * value boundaries), then two cumulative windows over the sorted
    * distinct values. The windowed frame is at most |distinct values|
    * rows regardless of input size.
    *
    * Returns one row (ks_stat, n_a, n_b), ks_stat rounded to 6.
    */
  def ksTwoSample(
      df: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(
        sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .crossJoin(broadcast(totals))
      .agg(
        round(max(abs(col("cuma") / col("n_a") - col("cumb") / col("n_b"))), 6)
          .as("ks_stat"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
  }
}
