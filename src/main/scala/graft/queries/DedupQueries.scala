package graft.queries

import graft.{Q, Tables}
import graft.operators.{DupGraph, Similarity, TextDedup}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at the operator level: MinHash+LSH over
  * the full documents table, banded SimHash, and embedding-cosine
  * pairs. Each oracle replicates the *entire* algorithm (signatures,
  * banding, verification) in DuckDB SQL with the shared md5-based
  * 60-bit hash, so the hash-match certifies algorithmic identity, not
  * just plausible output.
  */
object DedupQueries {

  val all: Seq[Q] = Seq(
    Q.sql(
      "minhash_lsh_dup",
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
        |      s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) AS sh
        |  FROM tok WHERE len(w) >= 2),
        |sig AS (
        |  SELECT doc_id, sh,
        |    list_transform(range(0, 12), j ->
        |      list_min(list_transform(sh, h ->
        |        ((xor(h, CAST(('0x'||substr(md5('a#'||j),1,15)) AS BIGINT))
        |          + CAST(('0x'||substr(md5('b#'||j),1,15)) AS BIGINT))
        |         & 1152921504606846975)))) AS sig
        |  FROM sh),
        |bands AS (
        |  SELECT doc_id, sh, b,
        |    md5(CAST(sig[b*3+1] AS VARCHAR) || '_' || CAST(sig[b*3+2] AS VARCHAR)
        |        || '_' || CAST(sig[b*3+3] AS VARCHAR)) AS bkey
        |  FROM sig, range(0,4) r(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |verified AS (
        |  SELECT c.id_a, c.id_b,
        |    round(len(list_intersect(sa.sh, sb.sh))::DOUBLE / len(list_distinct(sa.sh || sb.sh)), 4) AS jaccard
        |  FROM cand c
        |  JOIN sh sa ON sa.doc_id = c.id_a
        |  JOIN sh sb ON sb.doc_id = c.id_b)
        |SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.8
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      TextDedup.minhashLshPairs(
        Tables.documents(s, d), "doc_id", "text",
        numHashes = 12, bands = 4, shingleN = 2, threshold = 0.8)
        .orderBy($"id_a", $"id_b")
    },

    Q.sql(
      "simhash_dup",
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE doc_id < 200),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
        |      s -> CAST(('0x'||substr(md5(s),1,15)) AS BIGINT))) AS g
        |  FROM tok),
        |sim AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_transform(range(0, 60), b ->
        |        CASE WHEN list_sum(list_transform(g, h ->
        |          CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
        |      (acc, x) -> acc * 2 + x) AS sh
        |  FROM sh)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 10
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      TextDedup.simhashPairs(
        Tables.documents(s, d).filter($"doc_id" < 200), "doc_id", "text",
        maxHamming = 10, shingleN = 2)
        .orderBy($"id_a", $"id_b")
    },

    Q.sql(
      "embedding_cosine_dup",
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings WHERE vec_id < 300)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v)
        |        / sqrt(list_dot_product(a.v, a.v))
        |        / sqrt(list_dot_product(b.v, b.v)), 6) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v)
        |        / sqrt(list_dot_product(a.v, a.v))
        |        / sqrt(list_dot_product(b.v, b.v)), 6) >= 0.40
        |ORDER BY id_a, id_b""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Similarity.cosineDupPairs(
        Tables.embeddings(s, d).filter($"vec_id" < 300), "vec_id", "embedding",
        threshold = 0.40)
        .orderBy($"id_a", $"id_b")
    },

    // near-dup pairs → clusters: connected components by iterative
    // min-label propagation (Spark) vs a recursive-CTE transitive
    // closure (DuckDB) — one canonical id per dup family
    Q.sql(
      "dup_components",
      """WITH RECURSIVE
        |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |      FROM embeddings WHERE vec_id < 300),
        |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
        |      FROM v a JOIN v b ON a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.vv, b.vv)
        |            / sqrt(list_dot_product(a.vv, a.vv))
        |            / sqrt(list_dot_product(b.vv, b.vv)), 6) >= 0.40),
        |edges AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
        |walk AS (
        |  SELECT a AS node, a AS label FROM edges
        |  UNION
        |  SELECT e2.a AS node, w.label AS label FROM edges e2 JOIN walk w ON w.node = e2.b
        |)
        |SELECT node, CAST(min(label) AS BIGINT) AS component
        |FROM walk GROUP BY node ORDER BY node""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val pairs = Similarity.cosineDupPairs(
        Tables.embeddings(s, d).filter($"vec_id" < 300), "vec_id", "embedding",
        threshold = 0.40)
      DupGraph.connectedComponents(pairs).orderBy($"node")
    },

    // clusters → canonical survivors: one row per dup family (its min
    // id) plus everything unpaired — the complete near-dedup output
    Q.sql(
      "near_dedup_survivors",
      """WITH RECURSIVE
        |v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |      FROM embeddings WHERE vec_id < 300),
        |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
        |      FROM v a JOIN v b ON a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.vv, b.vv)
        |            / sqrt(list_dot_product(a.vv, a.vv))
        |            / sqrt(list_dot_product(b.vv, b.vv)), 6) >= 0.40),
        |edges AS (SELECT ia AS a, ib AS b FROM p UNION SELECT ib, ia FROM p),
        |walk AS (
        |  SELECT a AS node, a AS label FROM edges
        |  UNION
        |  SELECT e2.a AS node, w.label AS label FROM edges e2 JOIN walk w ON w.node = e2.b
        |)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id < 300 AND vec_id NOT IN (
        |  SELECT node FROM walk GROUP BY node HAVING min(label) <> node)
        |ORDER BY vec_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val emb = Tables.embeddings(s, d).filter($"vec_id" < 300)
      val pairs = Similarity.cosineDupPairs(emb, "vec_id", "embedding", threshold = 0.40)
      val (survivors, _) = DupGraph.nearDedupSurvivors(emb, "vec_id", pairs)
      survivors.select($"vec_id").orderBy($"vec_id")
    }
  )
}
