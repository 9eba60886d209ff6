package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles with a DISTRIBUTED plan.
  *
  * Spark's built-in `percentile` aggregate collects every group's
  * values into one reducer's memory — exact, but group size is capped
  * by executor heap, the wrong shape for billion-row groups. This
  * formulation is a VALUE HISTOGRAM: `groupBy(keys, value).count()`
  * collapses the fact table map-side to one row per distinct value
  * (the only shuffle that sees fact-scale data, and partial
  * aggregation bounds what actually moves), then a cumulative-count
  * sort window over the DISTINCT values finds, per requested p, the
  * histogram rows whose cumulative range brackets the two
  * interpolation ranks, and a single aggregate interpolates
  * `lower + (higher - lower) * frac` — the identical formula (and
  * double arithmetic) as `percentile` and DuckDB's `quantile_cont`,
  * verified value-identical in QuantilesSpec.
  *
  * Why histogram, not rank-the-rows: a row-level sort window buffers
  * every row of a group in the window evaluator
  * (ExternalAppendOnlyUnsafeRowArray) — at a 600M-row lineitem with 3
  * groups that is a 200M-row spill array per task, measured OOMing
  * under concurrency (round 14). Real columns are bounded-domain
  * (prices in cents, integer quantities, scores), so distinct values
  * ≪ rows and the window input collapses by orders of magnitude;
  * ties cost nothing extra because a tie IS one histogram row. The
  * worst case (all values distinct) degrades to the old shape's
  * cardinality, no worse.
  */
object Quantiles {

  /** One row per group; one output column per requested (name, p).
    * Nulls in `valCol` are ignored, matching `percentile` semantics —
    * including an all-null group, which keeps its output row with
    * null percentiles (nulls sort last and `_n` counts non-nulls, so
    * no rank ever matches and the interpolation nulls out).
    */
  def groupPercentiles(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    groupPercentiles(df, Seq(groupCol), valCol, ps)

  /** Multi-key grouping variant (e.g. (group, unpivoted-column-name)
    * in [[winsorize]]).
    */
  def groupPercentiles(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    percentilesFromHistogram(
      valueHistogram(df, groupCols, valCol), groupCols, ps)
  }

  /** The fact-scale half of [[groupPercentiles]]: one row per distinct
    * (group, value) with its count — the ONLY stage that sees
    * fact-scale rows, and map-side partial aggregation collapses it
    * before the shuffle. A null value forms its own histogram row (it
    * must not vanish — an all-null group still owes an output row).
    * Exposed separately so derived statistics (e.g. [[madOutliers]]'s
    * deviation histogram) can be computed FROM the histogram instead
    * of re-aggregating the fact table.
    */
  private[operators] def valueHistogram(
      df: DataFrame, groupCols: Seq[String], valCol: String): DataFrame = {
    val keys = groupCols.map(col)
    df.select(keys :+ col(valCol).cast("double").as("_v"): _*)
      .groupBy(keys :+ col("_v"): _*)
      .agg(count(lit(1)).as("_hc"))
  }

  /** Rank-selection half of [[groupPercentiles]]: interpolated
    * percentiles over a (groupCols, _v, _hc) value histogram.
    * `repartitionKeys = false` skips the hash repartition when the
    * caller knows the histogram is ALREADY partitioned by the group
    * keys (a derived histogram downstream of this function's own
    * windows), so no redundant exchange is planned.
    */
  private[operators] def percentilesFromHistogram(
      hist: DataFrame,
      groupCols: Seq[String],
      ps: Seq[(String, Double)],
      repartitionKeys: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      "percentiles must be in [0, 1]")
    val keys = groupCols.map(col)
    val sortW = Window.partitionBy(keys: _*).orderBy(col("_v").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cntW = Window.partitionBy(keys: _*)
    // explicit numPartitions: an AQE-planned exchange here coalesces
    // the (small-byte) shuffle to ONE partition — harmless now that
    // the window input is distinct-value-sized, but in the
    // all-values-distinct worst case the window would run single-task
    // over fact-scale rows, a straight scale hazard. A user-specified
    // repartition is exempt from coalescing, and hash-on-keys
    // satisfies the window's required distribution, so no second
    // exchange appears.
    val n = hist.sparkSession.sessionState.conf.numShufflePartitions
    val nonNullCnt = when(col("_v").isNotNull, col("_hc")).otherwise(0L)
    // 2. cumulative counts over the distinct sorted values: histogram
    //    row r covers sorted ranks (_cum - _hc, _cum]; `_n` = non-null
    //    total per group (count(_v) semantics — nulls ignored)
    val ranked = (if (repartitionKeys) hist.repartition(n, keys: _*) else hist)
      .withColumn("_cum", sum(nonNullCnt).over(sortW))
      .withColumn("_n", sum(nonNullCnt).over(cntW))
    // 3. rank selection: the value at 1-based rank k is the histogram
    //    row whose cumulative range contains k — ties are free (a tie
    //    IS one row, and any rank inside it reads the tied value,
    //    exactly like the row-ranked formulation)
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val loIdx = floor(pos).cast("long") + 1 // 0-based pos → 1-based rank
      val hiIdx = ceil(pos).cast("long") + 1
      def atRank(k: org.apache.spark.sql.Column) =
        max(when(col("_v").isNotNull &&
          col("_cum") - col("_hc") < k && k <= col("_cum"), col("_v")))
      Seq(
        atRank(loIdx).as(s"_lo_$name"),
        atRank(hiIdx).as(s"_hi_$name"),
        // the two interpolation weights, with the same double
        // arithmetic as Spark's Percentile.getPercentile:
        // (higher - position) and (position - lower)
        first(ceil(pos).cast("double") - pos).as(s"_wl_$name"),
        first(pos - floor(pos).cast("double")).as(s"_wh_$name"))
    }
    val agg = ranked.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    val out = keys ++ ps.map { case (name, _) =>
      when(col(s"_wh_$name") === 0.0, col(s"_lo_$name"))
        .otherwise(col(s"_wl_$name") * col(s"_lo_$name") +
          col(s"_wh_$name") * col(s"_hi_$name"))
        .as(name)
    }
    agg.select(out: _*)
  }

  /** Winsorize MANY numeric columns to their per-group [loP, hiP]
    * percentile bounds in one operator: the value columns are
    * unpivoted with `stack` so ONE histogram pass (keyed by group ×
    * column-name) computes every column's exact bounds, the tiny
    * bounds table pivots back wide and broadcasts onto the fact — no
    * per-column re-shuffle, no full-table sort, outlier clipping for
    * N feature columns at the cost of one.
    *
    * Returns `df` with each value column clipped (cast to double);
    * other columns untouched.
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valCols: Seq[String],
      loP: Double = 0.05,
      hiP: Double = 0.95): DataFrame = {
    require(valCols.nonEmpty, "winsorize needs at least one value column")
    require(0 <= loP && loP <= hiP && hiP <= 1, s"need 0 <= lo <= hi <= 1, got [$loP, $hiP]")
    def quoted(c: String) = graft.plans.SqlIdent.quote(c)
    val stackArgs = valCols
      .map(c => s"'${c.replace("'", "''")}', CAST(${quoted(c)} AS DOUBLE)")
      .mkString(", ")
    val long = df.select(col(groupCol),
      expr(s"stack(${valCols.length}, $stackArgs) AS (_c, _wv)"))
    val bounds = groupPercentiles(long, Seq(groupCol, "_c"), "_wv",
      Seq("lo" -> loP, "hi" -> hiP))
    val wide = bounds.groupBy(col(groupCol)).pivot("_c", valCols)
      .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"))
    val clipped = df.columns.map { c =>
      if (valCols.contains(c)) {
        val v = col(quoted(c)).cast("double")
        // greatest/least SKIP nulls, which has two convenient edges and
        // one trap: null bounds (NULL-group rows under the left join
        // below) pass the value through unclipped — wanted — but a null
        // VALUE would come back as the lower bound — fabricated data —
        // so nulls are preserved explicitly.
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col(quoted(s"${c}_lo"))), col(quoted(s"${c}_hi"))))
          .as(c)
      } else col(quoted(c))
    }
    // left join: rows whose group is NULL (no bounds row) are kept,
    // not silently dropped by an inner equi-join
    df.join(broadcast(wide), Seq(groupCol), "left").select(clipped.toIndexedSeq: _*)
  }

  /** Adaptive per-group quality gate: flag every row whose value falls
    * BELOW its own group's p-quantile — per-language/per-source
    * cutoffs instead of one global threshold (a fixed floor that's
    * right for English prose over-prunes Chinese or code). Returns the
    * flagged rows with the group threshold attached (rounded to 6,
    * deterministic cross-engine); the complement view (rows to keep)
    * is the caller's anti-join.
    *
    * Scale: thresholds are one row per group (broadcast); the fact
    * side is filtered in place, no second shuffle.
    */
  def quantileGate(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      p: Double,
      thresholdName: String = "threshold"): DataFrame = {
    val bounds = groupPercentiles(df, groupCol, valCol, Seq(thresholdName -> p))
      .withColumn(thresholdName, round(col(thresholdName), 6))
    df.join(broadcast(bounds), Seq(groupCol))
      .filter(col(valCol).cast("double") < col(thresholdName))
  }

  /** Robust per-group outlier flagging via median absolute deviation:
    * flag rows with |v − median| > k·MAD, the estimator that (unlike
    * mean/stddev z-scores) doesn't let the outliers themselves drag
    * the threshold. Two exact distributed medians (value, then
    * deviation) over the same machinery as [[groupPercentiles]];
    * intermediate medians and deviations round to 6 so the cut
    * replays identically cross-engine.
    *
    * Returns the flagged rows with (med, mad, dev) attached. Groups
    * where MAD = 0 (over half the values identical) flag every
    * deviating row — the conventional degenerate-MAD behavior.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      k: Double = 3.0): DataFrame = {
    // ONE fact-scale histogram serves both percentile passes: the
    // deviation |v − med| of a value that occurs c times is one
    // deviation occurring c times, so the dev histogram is a pure
    // per-row transform + re-group of the (distinct-value-sized) value
    // histogram — the old shape re-aggregated the whole fact table a
    // second time for the identical multiset. Round-17 (guide §2.3/2.4:
    // aggregate once, derive downstream stats from the small frame).
    // The inner join on groupCol drops NULL-group rows exactly as the
    // old `df.join(med)` inner join did.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    // both percentile branches hang off the SAME repartition exchange,
    // so ReuseExchange computes the fact aggregation once and the med
    // and dev branches just re-read the shuffled histogram
    val hist = valueHistogram(df, Seq(groupCol), valCol)
      .repartition(n, col(groupCol))
    val med = percentilesFromHistogram(hist, Seq(groupCol),
      Seq("med" -> 0.5), repartitionKeys = false)
      .withColumn("med", round(col("med"), 6))
    // the dev histogram: same dev values (round-6 of |v − med| per
    // distinct v == per row), counts merged where two values share a
    // deviation. The histogram is already hash-partitioned by
    // groupCol, and groupBy(groupCol, _v) plus the mad windows are
    // both satisfied by that partitioning, so this whole derivation
    // plans ZERO new exchanges.
    val devHist = hist.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol),
        round(abs(col("_v") - col("med")), 6).as("_v"),
        col("_hc"))
      .groupBy(col(groupCol), col("_v"))
      .agg(sum(col("_hc")).as("_hc"))
    val mad = percentilesFromHistogram(devHist, Seq(groupCol),
      Seq("mad" -> 0.5), repartitionKeys = false)
      .withColumn("mad", round(col("mad"), 6))
    df.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", round(abs(col(valCol).cast("double") - col("med")), 6))
      .join(broadcast(mad), Seq(groupCol))
      .filter(col("dev") > lit(k) * col("mad"))
  }
}
