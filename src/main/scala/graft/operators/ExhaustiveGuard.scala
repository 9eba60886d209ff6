package graft.operators

import org.apache.spark.sql.DataFrame

/** Precondition for the exhaustive O(n²) baseline operators
  * (`TextDedup.ngramJaccardPairs`, `Similarity.cosineDupPairs`): a
  * forgotten bound on a 100 TB input is a cluster-killer, so the
  * cross-join paths refuse inputs larger than an explicit `maxRows`.
  *
  * The check is a limit-probe — `limit(maxRows + 1).count()` — which
  * reads at most maxRows+1 rows PER SCAN PARTITION (LocalLimit under
  * the count aggregate), so the probe's cost is bounded by
  * partitions × maxRows rather than by the input's row count — cheap
  * relative to the O(n²) join it guards, though not constant.
  */
private[operators] object ExhaustiveGuard {

  def requireBounded(df: DataFrame, maxRows: Long, op: String): Unit = {
    require(maxRows > 0 && maxRows < Int.MaxValue, s"$op: maxRows must be in (0, 2^31)")
    val probe = df.limit(maxRows.toInt + 1).count()
    if (probe > maxRows)
      throw new IllegalArgumentException(
        s"$op is an exhaustive O(n^2) baseline and its input exceeds maxRows=$maxRows; " +
          "pre-filter the input to a bounded id range, raise maxRows deliberately, or " +
          "use the bucketed scale path (minhashLshPairs / simhashPairs / lshTopK) instead")
  }

  /** Same limit-probe, different contract: `df` is about to ride a
    * `broadcast()` hint, so a corpus-sized frame would OOM the driver
    * (or every executor) instead of merely running long. Fail loud
    * with the dial rather than letting the broadcast build die with
    * an opaque OOM at 100×.
    */
  def requireBroadcastable(df: DataFrame, maxRows: Long, op: String): Unit = {
    require(maxRows > 0 && maxRows < Int.MaxValue, s"$op: maxBroadcastQueries must be in (0, 2^31)")
    val probe = df.limit(maxRows.toInt + 1).count()
    if (probe > maxRows)
      throw new IllegalArgumentException(
        s"$op broadcasts its query side by contract and the query frame exceeds " +
          s"maxBroadcastQueries=$maxRows; pre-filter the query set, raise the bound " +
          "deliberately if the broadcast fits executor memory, or swap the roles " +
          "(the corpus side streams, only queries are broadcast)")
  }
}
