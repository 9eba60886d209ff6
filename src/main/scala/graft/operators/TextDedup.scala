package graft.operators

import graft.functions.GraftFunctions
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document deduplication operators for the training-data pipeline:
  * exact (hash groupBy), MinHash+LSH (shingle → signature → band →
  * bucket join → exact-Jaccard verify), SimHash (banded Hamming join).
  *
  * Scale design: no operator ever forms the full O(n²) pair space.
  *   - exact: one shuffle on the 128-bit content hash;
  *   - MinHash LSH: candidate pairs come from equi-joins on band
  *     buckets (shuffle on band key; bucket sizes are tiny for honest
  *     near-dup thresholds, and a count-based guard can drop
  *     pathological buckets);
  *   - SimHash: Hamming ≤ k search via the pigeonhole band trick —
  *     k+1 bit-blocks, equi-join on (block index, block bits) gives
  *     100% recall, then the exact bit_count filter verifies.
  */
object TextDedup {

  /** Exact dedup on canonicalized content: keeps the smallest id per
    * fingerprint group. Returns (survivors, removed).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val fp = canonicalFingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol))
    val ranked = df.withColumn("_fp_rn", row_number().over(w))
    (ranked.filter(col("_fp_rn") === 1).drop("_fp_rn"),
      ranked.filter(col("_fp_rn") > 1).drop("_fp_rn"))
  }

  /** Survivors-only exact dedup: the same smallest-id-per-fingerprint
    * row [[exact]]._1 returns, computed as ONE partial-aggregated min
    * instead of a full per-group sort window — the window buffers
    * every group's rows in the evaluator and sorts them; the min
    * aggregate collapses each group to one candidate row map-side
    * before the shuffle (round 17, guide §2.3). min over
    * struct(id, row) replays the window's ASC NULLS FIRST id order
    * (a null struct field compares first); a tie on id resolves to
    * the lexicographically-least full row where row_number picked
    * arbitrarily — both are "one row per group", and ids are unique
    * in every caller. Use this when the removed side isn't needed.
    */
  def exactSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rowStruct = struct(df.columns.toIndexedSeq.map(c =>
      col(graft.plans.SqlIdent.quote(c))): _*)
    df.select(canonicalFingerprint(col(textCol)).as("_fp"),
        struct(col(graft.plans.SqlIdent.quote(idCol)).as("_k"), rowStruct.as("_r")).as("_min"))
      .groupBy(col("_fp"))
      .agg(min(col("_min")).as("_m"))
      .selectExpr("_m._r.*")
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * @param numHashes signature length (bands * rowsPerBand)
    * @param bands     LSH bands; a pair is a candidate iff some band of
    *                  the signature matches exactly
    * @param threshold verified exact-Jaccard (on the distinct shingle
    *                  sets) at or above which a candidate is a dup pair
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded
    *         to 4 — the cross-engine comparison grain
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 12,
      bands: Int = 4,
      shingleN: Int = 2,
      threshold: Double = 0.8): DataFrame =
    minhashLshPairsReleasable(df, idCol, textCol, numHashes, bands, shingleN, threshold)._1

  /** [[minhashLshPairs]] plus a release handle that unpersists the
    * internal shingle/signature cache — call it once the pairs frame
    * has been fully consumed, so loop-driven callers (e.g.
    * [[Curation.curateCorpus]]) don't accumulate a corpus-sized cached
    * frame per invocation. Actions on the pairs frame after release
    * still succeed (they recompute the lineage).
    */
  def minhashLshPairsReleasable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 12,
      bands: Int = 4,
      shingleN: Int = 2,
      threshold: Double = 0.8): (DataFrame, () => Unit) = {
    val (sh, candidates) = lshCandidates(df, idCol, textCol, numHashes, bands, shingleN)
    val shOnly = sh.select(col("doc_id"), col("sh"), col("sig"))
    val pairs = candidates
      .join(shOnly.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), Seq("id_a"))
      .join(shOnly.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), Seq("id_b"))
      // slice-equality re-check drops xxhash-collision impostors from
      // the candidate stream (see lshCandidates) before the heavier
      // array-intersection jaccard runs
      .filter(bandMatch(bands, numHashes / bands))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    (pairs, () => { sh.unpersist(); () })
  }

  /** Shared LSH front half: the persisted (doc_id, sh, sig) frame and
    * the distinct banded candidate pairs (id_a < id_b, bare ids only).
    *
    * Round 18: the band bucket key is an 8-byte `xxhash64` over the
    * band's raw signature slice — 3× narrower through the self-join
    * exchange than the previous 32-char md5 string (guide §2.3).
    * Slice-equal docs always share a key; a hash collision only ADDS
    * a candidate pair, and every consumer re-checks true band
    * equality in-row ([[bandMatch]] over the attached signatures)
    * before its verify, so emitted results replay the md5-banded
    * oracle exactly (up to the same ~2⁻¹²⁸ md5-collision caveat the
    * tuning tables document).
    */
  private def lshCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      shingleN: Int): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    GraftFunctions.register(df.sparkSession)

    // shingles are hashed to 60-bit longs ONCE (fused native pass);
    // signatures, banding, and Jaccard verify all run on long arrays
    val sh = df.select(
      col(idCol).as("doc_id"),
      GraftFunctions.hashedShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", GraftFunctions.minhashSig(col("sh"), numHashes))
      .persist()

    // candidate pairs on bare ids (distinct over two longs — cheap),
    // shingle sets joined back only for the surviving pairs
    val banded = bandedKeys(sh, bands, rowsPerBand, carrySig = false)
    val a = banded.select(col("band"), col("bkey"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("doc_id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    (sh, candidates)
  }

  /** Sketch-quality probe for the MinHash family: for every LSH
    * candidate pair, the SIGNATURE-estimated Jaccard (matching
    * positions / numHashes — what a production pipeline would trust at
    * 100 TB, where exact shingle intersections are unaffordable)
    * against the exact shingle Jaccard, plus the absolute error. The
    * operator answers "how many hashes do we need" with data instead
    * of the textbook 1/sqrt(k) bound.
    *
    * Returns (id_a, id_b, est_jaccard, jaccard, abs_err), all rounded
    * to 4.
    */
  def minhashEstimateAccuracy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 12,
      bands: Int = 4,
      shingleN: Int = 2): DataFrame = {
    val (sh, candidates) = lshCandidates(df, idCol, textCol, numHashes, bands, shingleN)
    val both = sh.select(col("doc_id"), col("sh"), col("sig"))
    candidates
      .join(both.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), Seq("id_a"))
      .join(both.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), Seq("id_b"))
      // this probe emits one row per CANDIDATE, so xxhash-collision
      // impostors must be dropped here (see lshCandidates)
      .filter(bandMatch(bands, numHashes / bands))
      .withColumn("est_jaccard", round(
        aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).cast("double") / numHashes, 4))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .withColumn("abs_err", round(abs(col("est_jaccard") - col("jaccard")), 4))
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"), col("abs_err"))
  }

  /** LSH parameter-tuning table: for each (bands × rowsPerBand) split
    * of ONE shared signature frame, the candidate-pair count, the
    * verified-dup count, and the precision — the measurement that
    * picks the banding before a 100 TB run (more bands = higher
    * recall, quadratically more candidates to verify).
    *
    * One wave, not one per config: every config's band rows carry a
    * config tag into a SINGLE self-join on (cfg, band, bkey), and the
    * expensive jaccard verify runs once per DISTINCT candidate pair
    * across configs (the per-config verdicts are then joined back) —
    * a pair surfacing under 3 of 4 bandings costs one array
    * intersection, not three. The verify is explicitly repartitioned:
    * its input is few rows × big shingle arrays, exactly the
    * small-byte/heavy-CPU shape AQE's byte-based coalescing collapses
    * to one task.
    */
  def lshTuningTable(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, threshold: Double = 0.8, numHashes: Int = 12,
      configs: Seq[(Int, Int)] = Seq((2, 6), (3, 4), (4, 3), (6, 2))): DataFrame = {
    require(configs.nonEmpty && configs.forall { case (b, r) => b * r == numHashes },
      s"every (bands, rowsPerBand) config must multiply to numHashes=$numHashes")
    require(configs.map(_._1).distinct.size == configs.size,
      "band counts must be distinct (bands is the config key)")
    // Both heavy stages here break AQE's bytes≈cost assumption (the
    // bucket join's output is quadratic per bucket; the verify is
    // array-CPU-bound) and coalesce to one task under the default 1MB
    // floor — scope a lower floor over a CLONED session (ConfScope
    // re-binds the input there; a set/restore on the caller's session
    // would leak into concurrently-planning queries, e.g. Verify's
    // thread pool). The result is config-sized, so it re-binds to the
    // caller's session by a plain collect.
    // preferSortMergeJoin=false (scoped to the clone): where no
    // broadcast applies, the verify joins pick SHUFFLED HASH instead of
    // sort-merge — an SMJ there sorts the pair × shingle-array
    // intermediate, which spilled past the thin disk at the 5M-doc
    // replica. At small scale Spark still auto-broadcasts the
    // signature side, so this costs nothing (a shuffle_hash HINT would
    // defeat that broadcast and measurably slowed sf0.1 ~2x).
    refiningBase(configs) match {
      case Some(base) =>
        lshTuningFusedExact(df, idCol, textCol, shingleN, threshold, configs, base, numHashes)
      case None =>
        lshTuningAllPairsExact(df, idCol, textCol, shingleN, threshold, configs, numHashes)
    }
  }

  /** Pre-round-18 exact tuning path, kept as the fallback for config
    * sets with no refining base (see [[refiningBase]]): the all-config
    * banded self-join + per-config distinct.
    */
  private[graft] def lshTuningAllPairsExact(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      configs: Seq[(Int, Int)], numHashes: Int): DataFrame = {
    graft.plans.ConfScope.withConfs(df, tuningConfs) { dfc =>
      val sh = tuningSignatures(dfc, idCol, textCol, shingleN, numHashes)
      // try/finally: any failing action below (the cloned session runs
      // every action of this table) must still release the persisted
      // signature blocks — a bare success-path unpersist leaks them
      // for the JVM lifetime
      try {
      val shOnly = sh.select(col("doc_id"), col("sh"))
      val cand = tuningCandidates(sh, configs)
      // hash joins (via the scoped preferSortMergeJoin=false), never
      // sort-merge: an SMJ here sorts the pair × shingle-array
      // intermediate (each row carries an ~800 B array once sh_a is
      // attached), and that sort spilled past the thin disk at the
      // 5M-doc replica (SPILL_OUT_OF_MEMORY, round 15). A hash join
      // builds on the row-linear signature side and STREAMS the wide
      // pair rows — nothing pair-sized is ever sorted.
      val verdicts = cand.select(col("id_a"), col("id_b")).distinct()
        .join(shOnly.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(shOnly.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          (round(jaccard(col("sh_a"), col("sh_b")), 4) >= threshold).as("_ok"))
      // join back only the VERIFIED pairs (near-dup-sized, orders of
      // magnitude below the candidate stream) and count candidates
      // from cand alone: the old cand ⋈ all-verdicts join processed
      // the full candidate stream a second time — at the 5M-doc
      // replica cfg (6,2) alone holds ~157M candidates. With the
      // verified side this small it usually broadcasts; failing that
      // the scoped preferSortMergeJoin=false keeps it a hash join.
      val okPairs = verdicts.filter(col("_ok")).select(col("id_a"), col("id_b"))
      val perCfg = cand.groupBy(col("cfg"))
        .agg(count(lit(1)).as("n_candidates"))
        .join(
          cand.join(okPairs, Seq("id_a", "id_b"))
            .groupBy(col("cfg"))
            .agg(count(lit(1)).as("n_verified")),
          Seq("cfg"), "left")
        .select(col("cfg"), col("n_candidates"),
          coalesce(col("n_verified"), lit(0L)).as("n_verified"))
      // left join onto the literal config list so a zero-candidate
      // config still emits its row
      val cfgRows = configs.map { case (b, r) => (b, b.toLong, r.toLong) }
      val cfgDf = dfc.sparkSession.createDataFrame(cfgRows)
        .toDF("cfg", "bands", "rows_per_band")
      val outRows = cfgDf.join(perCfg, Seq("cfg"), "left")
        .select(col("bands"), col("rows_per_band"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_verified"), lit(0L)).as("n_verified"),
          round(coalesce(col("n_verified"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_candidates"), lit(0L)), lit(1L)), 6).as("precision"))
      // collect (one row per config) releases the clone and the
      // persisted signature frame before returning
      val schema = outRows.schema
      val local = outRows.collect()
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(local: _*), schema)
      } finally sh.unpersist()
    }
  }

  /** Shared AQE/join overrides for the tuning tables. Both heavy
    * stages break AQE's bytes≈cost assumption (the bucket join's
    * output is quadratic per bucket; the verify is array-CPU-bound)
    * and coalesce to one task under the default 1MB floor;
    * preferSortMergeJoin=false keeps the non-broadcast verify joins
    * SHUFFLED HASH so nothing pair×array-sized is ever sorted (the
    * sort spilled past the thin disk at the 5M-doc replica, round 15).
    */
  private val tuningConfs = Map(
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16KB",
    "spark.sql.join.preferSortMergeJoin" -> "false")

  /** Persisted `(doc_id, sh, sig)` signature frame the tuning tables
    * share — the caller owns the unpersist (try/finally).
    */
  private def tuningSignatures(
      dfc: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame = {
    GraftFunctions.register(dfc.sparkSession)
    dfc.select(
      col(idCol).as("doc_id"),
      GraftFunctions.hashedShingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", GraftFunctions.minhashSig(col("sh"), numHashes))
      .persist()
  }

  /** All-config candidate stream `(cfg, id_a, id_b)`: every config's
    * band rows carry a config tag into ONE bucket self-join on
    * (cfg, band, bkey); checkpointed because the per-config counts
    * AND the verify pass both consume it.
    */
  private def tuningCandidates(
      sh: DataFrame, configs: Seq[(Int, Int)]): DataFrame = {
    // all configs' band rows in one explode: (doc_id, cfg, band, bkey)
    val banded = sh.select(
      col("doc_id"),
      explode(array(configs.flatMap { case (b, r) =>
        (0 until b).map { bd =>
          struct(lit(b).as("cfg"), lit(bd).as("band"),
            md5(concat_ws("_",
              (0 until r).map(rr => element_at(col("sig"), bd * r + rr + 1)): _*))
              .as("bkey"))
        }
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.cfg"), col("bb.band"), col("bb.bkey"))
    banded.select(col("cfg"), col("band"), col("bkey"), col("doc_id").as("id_a"))
      .join(banded.select(col("cfg"), col("band"), col("bkey"), col("doc_id").as("id_b")),
        Seq("cfg", "band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cfg"), col("id_a"), col("id_b")).distinct()
      .localCheckpoint(true)
  }

  /** The config whose candidate set provably CONTAINS every config's,
    * if one exists: a pair matching some band B of config C also
    * matches any band B' ⊆ B of another config, so when every band of
    * every config contains at least one band of the finest config
    * (the one with the most bands), the finest config's candidates
    * are a superset of all. Holds for the default
    * (2,6)/(3,4)/(4,3)/(6,2) split — and whenever the finest rows/band
    * r0 satisfies r ≥ 2·r0 − 1 for every other config — and lets the
    * tuning tables self-join ONE band set instead of all of them
    * (round 18, guide §2.4): per-config candidacy is then decided
    * in-row from the signature slices of the shared pair stream.
    */
  private[graft] def refiningBase(configs: Seq[(Int, Int)]): Option[(Int, Int)] = {
    val base @ (b0, r0) = configs.maxBy(_._1)
    val covered = configs.forall { case (b, r) =>
      (0 until b).forall { j =>
        (0 until b0).exists(i => j * r <= i * r0 && (i + 1) * r0 <= (j + 1) * r)
      }
    }
    if (covered) Some(base) else None
  }

  /** The fused paths' banded frame for ONE config: (doc_id[, sig],
    * band, bkey) with an 8-byte `xxhash64` over the band's raw
    * signature slice as the bucket key — 3× narrower through the
    * self-join exchange than the legacy 32-char md5 string (round 18,
    * guide §2.3: shuffle keys, not payloads). Slice-equal docs always
    * share a key (hash of equal inputs); a hash COLLISION only ADDS a
    * stream row, which the in-row [[bandMatch]] flags (now applied to
    * EVERY config, base included) zero out of every count.
    */
  private def bandedKeys(sh: DataFrame, b0: Int, r0: Int, carrySig: Boolean): DataFrame = {
    val cols = if (carrySig) Seq(col("doc_id"), col("sig")) else Seq(col("doc_id"))
    sh.select(cols :+
      explode(array((0 until b0).map { bd =>
        struct(lit(bd).as("band"),
          xxhash64(
            (0 until r0).map(rr => element_at(col("sig"), bd * r0 + rr + 1)): _*)
            .as("bkey"))
      }: _*)).as("bb"): _*)
      .select(cols ++ Seq(col("bb.band"), col("bb.bkey")): _*)
  }

  /** Distinct candidate pairs of ONE banding config — the base
    * config's self-join in the fused exact tuning path, bare ids
    * only. May contain hash-collision impostors (see [[bandedKeys]]);
    * the caller's per-config [[bandMatch]] flags neutralize them.
    */
  private def baseCandidates(sh: DataFrame, b0: Int, r0: Int): DataFrame = {
    val banded = bandedKeys(sh, b0, r0, carrySig = false)
    banded.select(col("band"), col("bkey"), col("doc_id").as("id_a"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("id_b")),
        Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** In-row candidacy of a pair under config (b, r): some band's
    * signature slice matches exactly. Equality of the raw slices
    * stands in for equality of the legacy path's md5 band keys —
    * divergence needs an md5 collision between distinct slice strings
    * (~2⁻¹²⁸, and no engine-visible input can exercise it). Applied
    * to every config INCLUDING the base, so xxhash collisions in the
    * fused pair stream count toward nothing.
    */
  private def bandMatch(b: Int, r: Int): org.apache.spark.sql.Column =
    (0 until b).map { bd =>
      slice(col("sig_a"), bd * r + 1, r) === slice(col("sig_b"), bd * r + 1, r)
    }.reduce(_ || _)

  /** Fused exact tuning table (round 18): ONE base-config self-join
    * builds the shared distinct pair stream (bare ids through the
    * quadratic stage — guide §8), the signature and shingle arrays
    * attach once per side (row-linear hash joins), per-config
    * candidacy and the jaccard verdict are computed in-row, and one
    * global aggregate of conditional sums yields every config's
    * counts — no per-config distinct, no checkpoint of the full
    * (cfg, pair) stream, no verdict join-back.
    */
  private def lshTuningFusedExact(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      configs: Seq[(Int, Int)], base: (Int, Int), numHashes: Int): DataFrame = {
    graft.plans.ConfScope.withConfs(df, tuningConfs) { dfc =>
      val sh = tuningSignatures(dfc, idCol, textCol, shingleN, numHashes)
      try {
        val pairs = baseCandidates(sh, base._1, base._2)
        val both = sh.select(col("doc_id"), col("sh"), col("sig"))
        val sides = pairs
          .join(both.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
            col("sig").as("sig_a")), Seq("id_a"))
          .join(both.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
            col("sig").as("sig_b")), Seq("id_b"))
          .withColumn("_ok",
            round(jaccard(col("sh_a"), col("sh_b")), 4) >= threshold)
        val flagged = sides.select(configs.zipWithIndex.flatMap { case ((b, r), i) =>
          val m = bandMatch(b, r)
          Seq(when(m, 1L).otherwise(0L).as(s"_m$i"),
            when(m && col("_ok"), 1L).otherwise(0L).as(s"_v$i"))
        }: _*)
        val sums = configs.indices.flatMap(i =>
          Seq(sum(col(s"_m$i")).as(s"_ms$i"), sum(col(s"_v$i")).as(s"_vs$i")))
        // one row always (global aggregate); nulls = empty pair stream
        val row = flagged.agg(sums.head, sums.tail: _*).head()
        val outRows = configs.zipWithIndex.map { case ((b, r), i) =>
          (b.toLong, r.toLong,
            if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i),
            if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1))
        }
        df.sparkSession.createDataFrame(outRows)
          .toDF("bands", "rows_per_band", "n_candidates", "n_verified")
          .withColumn("precision",
            round(col("n_verified").cast("double") /
              greatest(col("n_candidates"), lit(1L)), 6))
      } finally sh.unpersist()
    }
  }

  /** [[lshTuningTable]] with a SAMPLED verify — the tuning table's
    * scale path. The exact-count formulation is measured infeasible
    * on any engine at the fourth decade (cfg (6,2) over-candidates
    * ~600× at the 5M-doc replica → ~157M exact-verify pairs × ~1.2KB
    * shingle arrays; BENCH_NOTES Round-15e), and a production tuning
    * run samples its verify anyway: per-config CANDIDATE counts stay
    * exact (narrow rows, linear traffic), while the expensive
    * jaccard verify runs only on a deterministic hash-sample of the
    * distinct candidate pairs — accept pair (a,b) iff
    * `hash60(seed:a_b) / 2^60 < sampleRate`, the RNG-free
    * [[Curation.importanceSample]] scheme, so the sampled set is
    * EXACT on any engine/layout and the oracle replays it verbatim.
    * Sampling keys on pair identity, not (cfg, pair): a pair
    * surfacing under 3 of 4 bandings is verified once and its
    * verdict reused, and every config's estimate shares one sample
    * frame. The verify's traffic is rate-bounded by construction:
    * at the 5M-doc replica, rate 0.02 × ~157M pairs ≈ 3M verifies
    * (~7 GB of array traffic) where the exact table needed hundreds.
    *
    * Output per config: exact `n_candidates`, the sample size
    * `n_sampled`, `n_verified_sampled`, and
    * `precision_est = n_verified_sampled / max(n_sampled, 1)` —
    * the estimator's denominator is in the row, so a reader can
    * attach binomial error bars.
    */
  def lshTuningTableSampled(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, threshold: Double = 0.8, numHashes: Int = 12,
      configs: Seq[(Int, Int)] = Seq((2, 6), (3, 4), (4, 3), (6, 2)),
      sampleRate: Double = 0.02, sampleSeed: String = "lts5"): DataFrame = {
    require(configs.nonEmpty && configs.forall { case (b, r) => b * r == numHashes },
      s"every (bands, rowsPerBand) config must multiply to numHashes=$numHashes")
    require(configs.map(_._1).distinct.size == configs.size,
      "band counts must be distinct (bands is the config key)")
    require(sampleRate > 0.0 && sampleRate <= 1.0,
      s"sampleRate must be in (0, 1], got $sampleRate")
    refiningBase(configs) match {
      case Some(base) =>
        lshTuningFusedSampled(df, idCol, textCol, shingleN, threshold,
          configs, base, numHashes, sampleRate, sampleSeed)
      case None =>
        lshTuningAllPairsSampled(df, idCol, textCol, shingleN, threshold,
          configs, numHashes, sampleRate, sampleSeed)
    }
  }

  /** Fused sampled tuning table (round 18): the banded self-join runs
    * on the BASE config's 6 band rows/doc instead of all 15 and
    * carries the 12-long signature through, so per-config candidacy
    * is decided in-row BEFORE the pair-identity distinct — the
    * distinct then shuffles (id_a, id_b, 4 flag longs) only, the
    * checkpointed stream is flags+ids (no cfg-tagged 15-band stream,
    * no second pair-identity distinct for the sample), the exact
    * per-config candidate counts are one conditional-sum aggregate
    * over the flags, and the rate-bounded sample branch is the only
    * consumer that ever touches the shingle arrays. Extra shuffle
    * bytes vs the all-pairs path: the signature through the self-join
    * — 2 × bands × ~100 B per doc, corpus-LINEAR — in exchange for
    * dropping the pair-QUADRATIC cfg-tagged distinct + checkpoint +
    * verdict join-back (guide §2.3/§2.4/§8).
    */
  private def lshTuningFusedSampled(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      configs: Seq[(Int, Int)], base: (Int, Int), numHashes: Int,
      sampleRate: Double, sampleSeed: String): DataFrame = {
    graft.plans.ConfScope.withConfs(df, tuningConfs) { dfc =>
      val sh = tuningSignatures(dfc, idCol, textCol, shingleN, numHashes)
      try {
        val banded = bandedKeys(sh, base._1, base._2, carrySig = true)
        // flags computed on the raw (multiplicity-bearing) match stream,
        // deterministic per pair, so distinct over (ids, flags) has pair
        // cardinality; checkpointed because both count branches consume
        // it. Every config's flag (base included) is the in-row slice
        // equality, so an xxhash key collision contributes all-zero
        // flags — present in the stream, absent from every count.
        val flagCols = configs.zipWithIndex.map { case ((b, r), i) =>
          when(bandMatch(b, r), 1L).otherwise(0L).as(s"_f$i")
        }
        val flagged = banded
          .select(col("band"), col("bkey"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
          .join(banded
            .select(col("band"), col("bkey"), col("doc_id").as("id_b"), col("sig").as("sig_b")),
            Seq("band", "bkey"))
          .filter(col("id_a") < col("id_b"))
          .select(Seq(col("id_a"), col("id_b")) ++ flagCols: _*)
          .distinct()
          .localCheckpoint(true)
        // exact per-config candidate counts: one global conditional-sum
        val candDf = flagged.agg(
          sum(col("_f0")).as("_c0"),
          configs.indices.tail.map(i => sum(col(s"_f$i")).as(s"_c$i")): _*)
        // deterministic pair sample on bare ids (rate-bounded), then the
        // shingle arrays attach to the SAMPLE only
        val u = hash60(concat(lit(sampleSeed), lit(":"),
          col("id_a").cast("string"), lit("_"), col("id_b").cast("string")))
          .cast("double") / lit(1152921504606846976.0) // 2^60
        val shOnly = sh.select(col("doc_id"), col("sh"))
        val sampled = flagged.filter(u < sampleRate)
          .join(shOnly.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(shOnly.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("_ok",
            round(jaccard(col("sh_a"), col("sh_b")), 4) >= threshold)
        val sampDf = sampled.agg(
          sum(col("_f0")).as("_s0"),
          (configs.indices.tail.map(i => sum(col(s"_f$i")).as(s"_s$i")) ++
            configs.indices.map(i =>
              sum(when(col("_ok"), col(s"_f$i")).otherwise(0L)).as(s"_v$i"))): _*)
        // both branches read the checkpointed flags independently —
        // overlap the two actions (guide §2.6) instead of paying two
        // serial AQE job turnarounds
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fCand = Future(candDf.head())
        val fSamp = Future(sampDf.head())
        val candRow = Await.result(fCand, Duration.Inf)
        val sampRow = Await.result(fSamp, Duration.Inf)
        val n = configs.size
        val outRows = configs.zipWithIndex.map { case ((b, r), i) =>
          (b.toLong, r.toLong,
            if (candRow.isNullAt(i)) 0L else candRow.getLong(i),
            if (sampRow.isNullAt(i)) 0L else sampRow.getLong(i),
            if (sampRow.isNullAt(n + i)) 0L else sampRow.getLong(n + i))
        }
        df.sparkSession.createDataFrame(outRows)
          .toDF("bands", "rows_per_band", "n_candidates", "n_sampled",
            "n_verified_sampled")
          .withColumn("precision_est",
            round(col("n_verified_sampled").cast("double") /
              greatest(col("n_sampled"), lit(1L)), 6))
      } finally sh.unpersist()
    }
  }

  /** Pre-round-18 sampled tuning path, kept as the fallback for config
    * sets with no refining base (see [[refiningBase]]).
    */
  private[graft] def lshTuningAllPairsSampled(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, threshold: Double,
      configs: Seq[(Int, Int)], numHashes: Int,
      sampleRate: Double, sampleSeed: String): DataFrame = {
    graft.plans.ConfScope.withConfs(df, tuningConfs) { dfc =>
      val sh = tuningSignatures(dfc, idCol, textCol, shingleN, numHashes)
      try {
        val shOnly = sh.select(col("doc_id"), col("sh"))
        val cand = tuningCandidates(sh, configs)
        // deterministic pair sample BEFORE any shingle array attaches:
        // the filter runs on narrow (id_a, id_b) rows, so the full
        // candidate stream crosses this stage at ~24 B/row and only
        // the rate-bounded survivors ever join the array side
        val u = hash60(concat(lit(sampleSeed), lit(":"),
          col("id_a").cast("string"), lit("_"), col("id_b").cast("string")))
          .cast("double") / lit(1152921504606846976.0) // 2^60
        val samp = cand.select(col("id_a"), col("id_b")).distinct()
          .filter(u < sampleRate)
        val verdicts = samp
          .join(shOnly.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(shOnly.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            (round(jaccard(col("sh_a"), col("sh_b")), 4) >= threshold).as("_ok"))
        // verdicts are sample-sized (rate × candidates): the join back
        // onto the full candidate stream broadcasts at any measured
        // scale, and the scoped preferSortMergeJoin=false keeps it a
        // hash join beyond that
        val sampledPerCfg = cand.join(verdicts, Seq("id_a", "id_b"))
          .groupBy(col("cfg"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(when(col("_ok"), 1L).otherwise(0L)).as("n_verified_sampled"))
        val perCfg = cand.groupBy(col("cfg"))
          .agg(count(lit(1)).as("n_candidates"))
          .join(sampledPerCfg, Seq("cfg"), "left")
        // left join onto the literal config list so a zero-candidate
        // config still emits its row
        val cfgRows = configs.map { case (b, r) => (b, b.toLong, r.toLong) }
        val cfgDf = dfc.sparkSession.createDataFrame(cfgRows)
          .toDF("cfg", "bands", "rows_per_band")
        val outRows = cfgDf.join(perCfg, Seq("cfg"), "left")
          .select(col("bands"), col("rows_per_band"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
            coalesce(col("n_verified_sampled"), lit(0L)).as("n_verified_sampled"),
            round(coalesce(col("n_verified_sampled"), lit(0L)).cast("double") /
              greatest(coalesce(col("n_sampled"), lit(0L)), lit(1L)), 6)
              .as("precision_est"))
        // collect (one row per config) releases the clone and the
        // persisted signature frame before returning
        val schema = outRows.schema
        val local = outRows.collect()
        df.sparkSession.createDataFrame(
          java.util.Arrays.asList(local: _*), schema)
      } finally sh.unpersist()
    }
  }

  /** Cross-group duplicate matrix: how many verified near-dup pairs
    * span each (group, group) combination — the leakage dashboard
    * (sources that heavily duplicate each other are mirrors or
    * re-crawls; diagonal entries are within-source duplication). The
    * pair list is checkpointed once, then joined to the group mapping
    * on each endpoint; output keyed on the unordered group pair.
    */
  def crossGroupDupMatrix(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      numHashes: Int = 12, bands: Int = 4, shingleN: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, numHashes, bands, shingleN, threshold)
      .localCheckpoint(true)
    val g = df.select(col(idCol), col(groupCol))
    pairs
      .join(g.select(col(idCol).as("id_a"), col(groupCol).as("_ga")), Seq("id_a"))
      .join(g.select(col(idCol).as("id_b"), col(groupCol).as("_gb")), Seq("id_b"))
      .groupBy(
        least(col("_ga"), col("_gb")).as("src_a"),
        greatest(col("_ga"), col("_gb")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Per-group near-duplication rate: share of each group's rows that
    * participate in at least one verified near-dup pair — the
    * source-quality ranking that decides which crawls to down-weight
    * before any cluster resolution runs.
    */
  def groupDupRate(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      numHashes: Int = 12, bands: Int = 4, shingleN: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, numHashes, bands, shingleN, threshold)
      .localCheckpoint(true)
    val dupIds = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol)))
      .distinct()
      .withColumn("_dup", lit(1))
    df.select(col(idCol), col(groupCol))
      .join(dupIds, Seq(idCol), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), count(col("_dup")).as("n_dup_docs"))
      .withColumn("dup_rate",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
  }

  /** Compute each row's 60-bit simhash over word shingles:
    * (idCol → doc_id, sh). The fused native shingle-hash pass.
    */
  def simhashOf(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(
      col(idCol).as("doc_id"),
      GraftFunctions.simhash60Fast(
        GraftFunctions.hashedShingles(col(textCol), shingleN)).as("sh"))
  }

  /** Explode a (doc_id, sh) simhash frame into pigeonhole block keys
    * (doc_id, sh, blk, bits): any two hashes within `maxHamming` share
    * at least one full block, so an equi-join on (blk, bits) generates
    * ALL true candidates (100% recall) without an O(n²) cross product.
    */
  def simhashBlocks(sim: DataFrame, maxHamming: Int): DataFrame = {
    // 60-bit hashes: beyond 59 the pigeonhole blocks degenerate to
    // zero-width (full cross join); reject rather than degrade
    require(maxHamming >= 0 && maxHamming < 60, s"maxHamming must be in [0,60), got $maxHamming")
    val nBlocks = maxHamming + 1 // pigeonhole guarantee
    val blockBits = 60.0 / nBlocks
    sim.select(
      col("doc_id"), col("sh"),
      explode(array((0 until nBlocks).map { blk =>
        val lo = math.round(blk * blockBits).toInt
        val hi = math.round((blk + 1) * blockBits).toInt
        struct(
          lit(blk).as("blk"),
          // bits [lo, hi): shift right lo, mask (1 << (hi-lo)) - 1
          call_function("shiftright", col("sh"), lit(lo))
            .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bits"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.blk"), col("bb.bits"))
  }

  /** Near-duplicate pairs from ANY precomputed (doc_id, sh) simhash
    * frame — the pigeonhole block join + exact verify, shared by the
    * text path, the binary-payload path, and the incremental ledger.
    */
  def simhashPairsOf(sim: DataFrame, maxHamming: Int): DataFrame = {
    val blocked = simhashBlocks(sim, maxHamming)
    val a = blocked.select(col("blk"), col("bits"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = blocked.select(col("blk"), col("bits"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk", "bits"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** SimHash near-duplicate pairs at Hamming distance <= maxHamming,
    * banded for scale via [[simhashBlocks]], then exactly verified
    * with the `bit_count` distance. Recall is 100%; the block join
    * replaces the O(n²) cross product.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 10,
      shingleN: Int = 2): DataFrame =
    simhashPairsOf(simhashOf(df, idCol, textCol, shingleN).persist(), maxHamming)

  /** Pairwise n-gram Jaccard over a bounded id range (the exhaustive
    * baseline the LSH paths approximate; at scale use minhashLshPairs
    * instead). Refuses inputs over `maxRows` — see [[ExhaustiveGuard]].
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      threshold: Double = 0.8,
      maxRows: Long = 10000): DataFrame = {
    ExhaustiveGuard.requireBounded(df, maxRows, "ngramJaccardPairs")
    val sh = df.select(
      col(idCol).as("doc_id"),
      shingles(tokens(col(textCol)), shingleN).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Edit-distance-≤1 string pairs WITHOUT a cross join, via deletion
    * neighborhoods (the SymSpell/FastSS family): each string keys on
    * itself plus each single-character deletion; any two strings
    * within one edit (substitute / insert / delete) provably share a
    * key, so candidates come from an equi-join on the derived key and
    * are then exactly verified with `levenshtein`. Candidate
    * generation is one explode (|s|+1 keys per string) + one shuffle
    * on the key — never strings × strings, so it survives a 100 TB
    * vocabulary where the exhaustive `q29`-style pair space cannot.
    *
    * Each key additionally carries the DELETED POSITION (0 for the
    * word itself), which prunes the bucket-internal pair space to
    * essentially the true pairs: two same-length words sharing a
    * deletion key at the SAME position differ only at that position
    * (one substitution), and an insert/delete pair puts the shorter
    * word in the bucket as the key itself (position 0). Any pair with
    * differing non-zero positions is ≥2 edits apart and is never
    * emitted — on a dense vocabulary (e.g. zero-padded TPC-H names,
    * where a bucket holds every one-digit variant) this collapses the
    * candidate set ~50× versus pairing the whole bucket, and the
    * `levenshtein` verify pass runs only over near-certain pairs, kept
    * to produce the `dist` column and to discard 8-byte hash-collision
    * impostors exactly.
    *
    * Input should be DISTINCT strings (a vocabulary); emits
    * (word_a < word_b, dist).
    *
    * SymSpell-style PREFIX bucketing (keying deletions of only the
    * first P chars) was measured and REJECTED (round 15, BENCH_NOTES):
    * on this vocabulary shape (shared literal prefix + varying digit
    * tail, i.e. zero-padded names) truncation collapses the key space
    * to a handful of buckets — candidate pairs explode 36×–1270×
    * (P=16: 35M, P=10: 1.24B vs 0.98M for full keys at sf0.1). The
    * SUFFIX mirror keeps candidates identical with 2.5× fewer key
    * bytes, but it breaks the deleted-position pruning invariant (an
    * insert inside the window pairs two DIFFERENT non-zero positions,
    * which the same-position filter would wrongly drop), and key bytes
    * are not this query's cost at any measured scale. Full deletion
    * keys stay.
    */
  def editDistance1Pairs(vocab: DataFrame, strCol: String): DataFrame = {
    // rename FIRST, derive keys in a second select: a generator whose
    // argument resolves to a same-select-list alias trips Spark 4's
    // lateral-column-alias rewrite (LateralColumnAliasReference
    // internal error)
    val base = vocab.select(col(strCol).as("w"))
    val w = col("w")
    // sequence(1, 0) DESCENDS in Spark — guard the empty string.
    // Deletions are NOT distinct-ed: a repeated char yields the same
    // key at two positions and both must key (the matching partner may
    // share either position); the duplicate pair it can emit is
    // removed by dropDuplicates below.
    val positions = when(length(w) >= 1, sequence(lit(1), length(w)))
      .otherwise(array_repeat(lit(1), 0))
    // keys travel as (8-byte hash, deleted position): halves shuffle
    // bytes vs the key string; a hash collision only ADDS a candidate
    // pair, which the exact levenshtein filter below removes
    val keys = concat(
      array(struct(xxhash64(w).as("kh"), lit(0).as("pos"))),
      transform(positions, i =>
        struct(
          xxhash64(concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w)))).as("kh"),
          i.as("pos"))))
    val keyed = base.select(w, explode(keys).as("kp"))
      .select(col("w"), col("kp.kh").as("kh"), col("kp.pos").as("pos"))
      // explicit partition count: vocab keys are byte-light, so AQE's
      // 1MB floor coalesces this exchange to ~1 task and the per-bucket
      // pair scan + levenshtein verify (the query's CPU) serialize.
      // A user repartition is exempt, satisfies the groupBy's required
      // clustering (no second exchange), and partial collect_list
      // wouldn't have reduced shuffle bytes anyway.
      .repartition(
        vocab.sparkSession.sessionState.conf.numShufflePartitions, col("kh"))
    // ONE shuffle, no join: group the (word, pos) members sharing a key.
    // A bucket for key k can only hold k itself plus strings one
    // insertion away from k — at most (|k|+1)·|Σ|+1 members for
    // alphabet Σ — so collect_list is bounded independent of corpus
    // size.
    val buckets = keyed.groupBy("kh")
      .agg(collect_list(struct(col("w"), col("pos"))).as("ms"))
      .filter(size(col("ms")) > 1)
    // emit only position-compatible pairs (same deleted position, or
    // one side IS the key): each survives the edit-1 test by
    // construction, so the per-bucket work is a quadratic scan over
    // position ints, not a quadratic pair materialization
    val pairs = buckets.select(explode(flatten(transform(col("ms"),
        (a, i) => transform(
          filter(
            slice(col("ms"), i + lit(2), size(col("ms"))),
            b => (a("pos") === b("pos") || a("pos") === 0 || b("pos") === 0) &&
              a("w") =!= b("w")),
          b => struct(
            least(a("w"), b("w")).as("word_a"),
            greatest(a("w"), b("w")).as("word_b")))))).as("p"))
      .select(col("p.word_a"), col("p.word_b"))
    pairs
      // verify BEFORE deduplicating: filtering first shrinks the dedup
      // shuffle to the verified pairs (a pair can share several keys).
      // The threshold overload computes a banded O(len) distance and
      // early-exits with -1 past the bound.
      .withColumn("dist", levenshtein(col("word_a"), col("word_b"), 1).cast("long"))
      .filter(col("dist") >= 1)
      .dropDuplicates("word_a", "word_b")
      .select(col("word_a"), col("word_b"), col("dist"))
  }

  /** Start positions of word n-grams that occur more than once in the
    * whole corpus (counting repeats inside one document), as
    * (idCol, s, e) coverage windows s..s+n-1. N-grams are formed with
    * window leads (no per-row array blowup), and the global
    * count/join runs on the 8-byte hash60 of the n-gram, not the
    * string — the shuffle carries longs.
    */
  /** Every word n-gram window as (idCol, pos, nh): start position and
    * the 60-bit hash of the space-joined gram, built IN-ROW from the
    * token array (transform over start positions + slice) — zero
    * shuffles, where the earlier window-lead formulation paid a
    * partition-and-sort on the doc id before a single gram existed.
    * The transient per-doc hash array is tokens-long, bounded by
    * document length, never corpus size.
    */
  private def ngramHashes(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, "n-gram windows need n >= 2")
    df.select(col(idCol), tokens(lower(col(textCol))).as("_w"))
      .filter(size(col("_w")) >= n)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("_w")) - n),
          i => hash60(concat_ws(" ", slice(col("_w"), i + 1, lit(n))))))
        .as(Seq("pos", "nh")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("nh"))
  }

  private def dupNgramWindows(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val ng = ngramHashes(df, idCol, textCol, n)
    // corpus frequency as ONE unordered window count over the gram
    // hash — the groupBy + join-back shape shuffles the full position
    // stream twice for the same answer (same pattern as ngramNovelty)
    ng.withColumn("_c", count(lit(1)).over(Window.partitionBy(col("nh"))))
      .filter(col("_c") > 1)
      .select(col(idCol), col("pos").as("s"), (col("pos") + (n - 1)).as("e"))
  }

  /** Duplicated-substring spans, Lee et al. 2022 (arXiv:2107.06499)
    * shape: every maximal token range covered by word n-grams that
    * appear elsewhere in the corpus. Overlapping/adjacent windows
    * merge into islands with the classic running-max window (per-doc
    * partitions — no global sort). Returns (idCol, span_start,
    * span_end) in token positions.
    */
  def duplicateNgramSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("s"), col("e"))
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    dupNgramWindows(df, idCol, textCol, n)
      .withColumn("_brk",
        when(col("s") > coalesce(prevMax, lit(-1L)), 1).otherwise(0))
      .withColumn("_g", sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("_g"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .drop("_g")
  }

  /** Shared front half of the scrub: (idCol, _w, _sp) — the token
    * array joined with the doc's merged span islands (null when none).
    */
  private def spansJoined(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // ship the MERGED islands back per-doc (few spans each) and scrub
    // IN-ROW: an exists() test per token against the doc's span list
    // replaces the exploded coverage stream, its (id, pos) anti-join
    // shuffle, and the collect_list re-sort of the survivor stream —
    // the only remaining shuffles are the ones the semantics force
    // (global gram frequency + the per-doc island merge)
    val spans = duplicateNgramSpans(df, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("_sp"))
    df.select(col(idCol), tokens(lower(col(textCol))).as("_w"))
      .join(spans, Seq(idCol), "left")
  }

  /** Tokens surviving the span scrub, in position order (in-row). */
  private def keptTokens: org.apache.spark.sql.Column =
    filter(
      transform(col("_w"), (t, i) =>
        when(exists(col("_sp"), s =>
          i.cast("long") >= s.getField("span_start") &&
            i.cast("long") <= s.getField("span_end")), lit(null))
          .otherwise(t)),
      t => t.isNotNull)

  /** Survivor count WITHOUT materializing the survivors: the islands
    * are disjoint and in-bounds by construction (the running-max merge
    * breaks on s > prevMax, and e = pos + n − 1 ≤ len − 1), so
    * n_kept = len − Σ island widths — pure arithmetic over the few
    * spans, no per-token pass.
    */
  private def keptCount: org.apache.spark.sql.Column =
    size(col("_w")).cast("long") - coalesce(
      aggregate(col("_sp"), lit(0L),
        (acc, s) => acc + s.getField("span_end") - s.getField("span_start") + lit(1L)),
      lit(0L))

  /** The scrub step of substring dedup: drop every token covered by a
    * duplicated n-gram window and stitch the survivors back together
    * in position order. Documents losing all tokens disappear.
    * Returns (idCol, n_kept, clean_text).
    */
  def removeDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame =
    spansJoined(df, idCol, textCol, n)
      .select(col(idCol), keptTokens.as("_kept"))
      .filter(size(col("_kept")) >= 1)
      .select(col(idCol), size(col("_kept")).cast("long").as("n_kept"),
        concat_ws(" ", col("_kept")).as("clean_text"))

  /** [[removeDuplicateSpans]] pre-sorted by idCol, for consumers whose
    * final output is id-ordered: the survivor filter runs on the
    * arithmetic [[keptCount]] (no token pass) BELOW the sort, and the
    * per-token scrub + stitch runs ONCE above it — a terminal sort's
    * range-sampling pass re-executes everything between the last
    * materialization point and the exchange, which for the old shape
    * meant the whole O(tokens × spans) scrub twice (round 18, guide
    * §1.4/§7.2; the round-17 final-projection sweep, extended to a
    * filter-carrying segment by splitting the filter from the scrub).
    */
  def removeDuplicateSpansSorted(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame =
    spansJoined(df, idCol, textCol, n)
      .filter(keptCount >= 1)
      .orderBy(col(idCol))
      .select(col(idCol), keptCount.as("n_kept"),
        concat_ws(" ", keptTokens).as("clean_text"))

  /** Per-document n-gram novelty: how much of a document is NOT seen
    * elsewhere in the corpus — the memorization/boilerplate signal
    * dual to [[duplicateNgramSpans]]. A window is "shared" when its
    * n-gram occurs in at least one OTHER document (distinct-doc count
    * > 1; in-document repetition alone stays novel — that is
    * repetition scoring's job, not novelty's).
    *
    * Returns (idCol, n_grams, shared_grams, novelty) with novelty =
    * 1 − shared/total rounded to 6. Documents shorter than n tokens
    * emit no row (no windows to judge). Scale: the document-frequency
    * aggregate and the join back both key on the 8-byte gram hash.
    */
  def ngramNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    // collapse to one row per (gram, doc) FIRST — the position stream
    // never re-shuffles, and the distinct-doc frequency is a window
    // count over the collapsed frame instead of a countDistinct plus a
    // join back of the full stream
    val perDoc = ngramHashes(df, idCol, textCol, n)
      .groupBy(col("nh"), col(idCol))
      .agg(count(lit(1)).as("_k"))
    perDoc
      .withColumn("_ddf", count(lit(1)).over(Window.partitionBy(col("nh"))))
      .groupBy(col(idCol))
      .agg(
        sum(col("_k")).as("n_grams"),
        sum(when(col("_ddf") > 1, col("_k")).otherwise(0L)).as("shared_grams"))
      .withColumn("novelty",
        round(lit(1.0) - col("shared_grams").cast("double") / col("n_grams"), 6))
  }
}
