package graft.queries

import graft.{Q, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  * The brute-force top-k is the exact baseline with a full DuckDB
  * oracle; the LSH variant is the scale path — its oracle is the
  * recall spec (SimilaritySpec) against the brute-force answer, so the
  * driver records rows-only for it.
  */
object SimilarityQueries {

  val all: Seq[Q] = Seq(
    Q.sql(
      "ann_topk_brute",
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT query_id, neighbor_id, sim, rank FROM (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, n.v)
        |          / sqrt(list_dot_product(q.v, q.v))
        |          / sqrt(list_dot_product(n.v, n.v)), 6) AS sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_dot_product(q.v, n.v)
        |            / sqrt(list_dot_product(q.v, q.v))
        |            / sqrt(list_dot_product(n.v, n.v)), 6) DESC, n.vec_id) AS rank
        |  FROM e q JOIN e n ON q.vec_id <> n.vec_id
        |  WHERE q.vec_id < 5) t
        |WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb, emb.filter($"vec_id" < 5), "vec_id", "embedding", k = 3)
        .orderBy($"query_id", $"rank")
    },

    // LSH-bucketed ANN: deterministic hyperplanes, multi-probe;
    // verified by TextOpsSpec's recall bound vs brute force.
    Q.rowsOnly("ann_topk_lsh") { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
        emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
        k = 3, tables = 8, planesPerTable = 6)
        .orderBy($"query_id", $"rank")
    },

    // IVF ANN: deterministic coarse quantizer + nProbe cell search;
    // verified by TextOpsSpec's recall bound vs brute force.
    Q.rowsOnly("ann_topk_ivf") { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        emb, emb.filter($"vec_id" < 5), "vec_id", "embedding",
        k = 3, centroidStep = 50, nProbe = 4)
        .orderBy($"query_id", $"rank")
    }
  )
}
