package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: the dedup families (MinHash, SimHash,
  * cosine) emit PAIRS; collapsing pairs into groups so one canonical
  * document survives per near-dup cluster needs connected components
  * over the pair graph.
  *
  * Implementation is iterative min-label propagation in pure DataFrame
  * ops (the standard large-scale CC shape: each round, every node
  * takes the min label among itself and its neighbors; converges in
  * O(graph diameter) rounds — near-dup clusters are shallow, so a few
  * rounds suffice). Each round is one shuffle join + aggregate;
  * intermediate label frames are persisted and released, and lineage
  * is kept flat so 100 TB inputs don't accumulate a mile-long plan.
  */
object DupGraph {

  /** Connected components over an undirected edge list.
    *
    * @param edges DataFrame with two node-id columns (`idA`, `idB`)
    * @return (node, component) — component = min node id reachable;
    *         only nodes that appear in at least one edge are emitted
    *         (singletons are their own component trivially).
    */
  def connectedComponents(
      edges: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .union(edges.select(col(idB).cast("long").as("src"), col(idA).cast("long").as("dst")))
    // self-loops make one round = a single join+min over (self ∪
    // neighbors), so each round references the label frame exactly
    // ONCE — chained rounds stay a linear plan, not an exponential one
    val symSelf = sym
      .union(sym.select(col("src"), col("src").as("dst")).distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = symSelf.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count() // materialize labels AND the symSelf cache it scans

    // BATCH propagation rounds lazily — `batch` chained joins run as
    // ONE Spark job, then a single action materializes the batch and
    // tests convergence. Near-dup clusters have tiny diameters, so
    // most inputs finish in one batch; the persist between batches
    // keeps lineage flat for high-diameter graphs.
    //
    // Convergence test = edge consistency: no edge may span two
    // labels. Unlike comparing against the batch-start labels (which
    // needs one extra all-quiet batch to notice), consistency holds
    // the moment propagation completes — a diameter-≤4 graph finishes
    // in a single batch — and it certifies the RESULT, not just the
    // fixpoint: labels only decrease and stay within their component,
    // so one label per component must be that component's min id.
    val batch = 4
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      var next = labels
      for (_ <- 0 until math.min(batch, maxIter - iter)) {
        next = symSelf
          .join(next.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node"))
          .agg(min("label").as("label"))
      }
      val persisted = next.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.count() // materialize once; the check below scans the cache twice
      val inconsistent = symSelf.filter(col("src") =!= col("dst"))
        .join(persisted.withColumnRenamed("node", "src").withColumnRenamed("label", "l_src"), "src")
        .join(persisted.withColumnRenamed("node", "dst").withColumnRenamed("label", "l_dst"), "dst")
        .filter(col("l_src") =!= col("l_dst")).limit(1).count()
      labels.unpersist()
      labels = persisted
      converged = inconsistent == 0
      iter += batch
    }
    symSelf.unpersist()
    // A silent partial result would hand wrong clusters to dedup —
    // fail loudly instead when the diameter exceeds the iteration cap
    // (releasing the loop's cache first, so a caught-and-retried
    // failure doesn't pin one node-sized frame per attempt).
    if (!converged) {
      labels.unpersist()
      throw new IllegalArgumentException(
        s"requirement failed: connectedComponents did not converge within $maxIter " +
          "iterations (graph diameter exceeds the cap); raise maxIter")
    }
    // hand back a lineage-severed copy and release the loop's cache —
    // otherwise every call leaks one node-sized persisted frame
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    out.select(col("node"), col("label").as("component"))
  }

  /** End-to-end near-dedup: given the corpus and its near-dup PAIRS
    * (from any dedup family), keep exactly one canonical row per
    * duplicate cluster — the component's min id — plus every row in no
    * pair at all. Returns (survivors, removed).
    */
  def nearDedupSurvivors(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b"): (DataFrame, DataFrame) = {
    val nonCanonical = connectedComponents(pairs, idA, idB)
      .filter(col("node") =!= col("component"))
      .select(col("node").cast("long").as(idCol))
    (df.join(nonCanonical, Seq(idCol), "left_anti"),
      df.join(nonCanonical, Seq(idCol), "left_semi"))
  }
}
