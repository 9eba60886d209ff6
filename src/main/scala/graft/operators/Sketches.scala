package graft.operators

import graft.functions.TextFunctions.hash60
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
  * aggregate: fixed-size frequency summaries for heavy-hitter queries
  * over unbounded token streams.
  *
  * The sketch is `rows × width` counters — here materialized as a
  * (row_id, bucket, cnt) frame of at most rows·width records,
  * regardless of input size. Building it is ONE partial-aggregated
  * groupBy over the exploded (row, bucket) pairs: each executor
  * pre-merges its local counters map-side, so the shuffle carries at
  * most rows·width records per partition — the whole point of a
  * sketch at 100 TB. Estimates never undercount (min over rows of an
  * always-over-counting cell), and the hash family is the library's
  * seeded 60-bit md5 convention, so DuckDB replays bit-identically.
  */
object Sketches {

  private def rowBuckets(tok: org.apache.spark.sql.Column, rows: Int, width: Int) =
    array((0 until rows).map { j =>
      struct(lit(j.toLong).as("row_id"),
        pmod(hash60(tok, j), lit(width.toLong)).as("bucket"))
    }: _*)

  /** Build the sketch from one token per input row:
    * (row_id, bucket, cnt) with cnt = number of tokens hashing there.
    */
  def countMinSketch(
      df: DataFrame, tokCol: String, rows: Int = 4, width: Int = 64): DataFrame = {
    require(rows >= 1 && width >= 1, "sketch needs rows >= 1, width >= 1")
    df.select(explode(rowBuckets(col(tokCol), rows, width)).as("rb"))
      .groupBy(col("rb.row_id").as("row_id"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for a (small) set of query tokens:
    * est(t) = min over sketch rows of the counter at t's bucket.
    * Never an undercount; collisions only inflate. The query side is
    * exploded to (tok, row_id, bucket) and LEFT-joined against the
    * sketch with absent cells coalesced to 0 — the sketch frame only
    * materializes touched cells, so a never-incremented cell is an
    * implicit 0 counter and a token absent from the build stream
    * correctly estimates 0 (the canonical CMS estimator). The sketch
    * side is at most rows·width records by construction, so at the
    * default 4×64 it broadcasts; a caller-supplied wide sketch above
    * ~2M cells falls back to a plain shuffle join rather than forcing
    * a broadcast of hundreds of MB onto every executor.
    */
  def cmsEstimate(
      sketch: DataFrame, items: DataFrame, tokCol: String,
      rows: Int = 4, width: Int = 64): DataFrame = {
    val sketchSide =
      if (rows.toLong * width <= 2_000_000L) broadcast(sketch) else sketch
    items.select(col(tokCol), explode(rowBuckets(col(tokCol), rows, width)).as("rb"))
      .select(col(tokCol), col("rb.row_id").as("row_id"), col("rb.bucket").as("bucket"))
      .join(sketchSide, Seq("row_id", "bucket"), "left")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Positions a key sets/tests in an m-bit Bloom filter with k
    * seeded hash60 functions — deduplicated, since two seeds may
    * collide on the same bit.
    */
  private def bloomBits(key: org.apache.spark.sql.Column, k: Int, m: Int) =
    array_distinct(array((0 until k).map(j =>
      pmod(hash60(key, j), lit(m.toLong))): _*))

  /** Bloom filter (Bloom 1970) over a key column, materialized as the
    * frame of SET bit positions (at most m rows however large the
    * build side) — the broadcastable membership summary that turns a
    * shuffle semi-join into a map-side probe at 100 TB.
    */
  def bloomBuild(df: DataFrame, keyCol: String, k: Int = 5, m: Int = 4096): DataFrame = {
    require(k >= 1 && m >= 1, "bloom needs k >= 1 hashes, m >= 1 bits")
    df.select(explode(bloomBits(col(keyCol), k, m)).as("bit")).distinct()
  }

  /** Probe keys against a built filter: a key is bloom-positive iff
    * ALL its bits are set (no false negatives; false-positive rate
    * ~ (1 - e^{-kn/m})^k). The probe explodes each key to its <= k
    * distinct bits and broadcast-joins the bit frame — the corpus-
    * side pass is embarrassingly parallel.
    */
  def bloomProbe(
      bloom: DataFrame, df: DataFrame, keyCol: String,
      k: Int = 5, m: Int = 4096): DataFrame =
    df.select(col(keyCol), explode(bloomBits(col(keyCol), k, m)).as("bit"))
      .join(broadcast(bloom.withColumn("_set", lit(1))), Seq("bit"), "left")
      .groupBy(col(keyCol))
      .agg((count(lit(1)) === sum(coalesce(col("_set"), lit(0)))).as("bloom_pos"))
}
