package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the shared q93/q109/q110 graph pipeline
  * (scratch): how much of each query is the 3-NN edge build vs the
  * iterative phase.
  */
object GraphStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val emb = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" < 500)
      time("emb scan")(noop(emb))
      val embC = emb.localCheckpoint(true)
      val edges = graft.operators.Similarity
        .bruteForceTopK(embC, embC, "vec_id", "embedding", k = 3)
        .select($"query_id".as("src"), $"neighbor_id".as("dst"))
      time("edges (bruteForceTopK, incl probe+agg jobs)")(noop(edges))
      val edgesC = time("edges checkpoint")(edges.localCheckpoint(true))
      val pr = time("pagerank construct (checkpoints+count)")(
        graft.operators.DupGraph.pageRank(edgesC, "src", "dst", iters = 3))
      time("pagerank final job")(noop(pr.select($"node", $"pagerank_e9").orderBy($"node")))
    }
    spark.stop()
  }
}
