package graft.queries

import graft.{Q, Tables}
import graft.operators.{LanguageModel, Retrieval, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-side primitives over `documents`/`embeddings`: BM25
  * lexical scoring, hybrid lexical+embedding rank fusion, and PMI
  * collocation mining — each replayed end-to-end in DuckDB SQL
  * (tokens = whitespace split of trimmed lowercased text; doubles
  * rounded before ranking so order is stable cross-engine).
  */
object RetrievalQueries {

  private val QueryTerms = Seq("vector", "stream", "window")

  /** Shared oracle CTE: BM25 (k1=1.2, b=0.75) of every document
    * matching ≥1 query term. Constants that are not exactly
    * representable in binary are cast ::DOUBLE so DuckDB's decimal
    * literals don't diverge from the JVM's double arithmetic.
    */
  private val Bm25Cte =
    """toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      |  FROM documents),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM toks
      |  WHERE tok IN ('vector', 'stream', 'window') GROUP BY doc_id, tok),
      |dfreq AS (SELECT tok, count(*) AS df_t FROM tf GROUP BY tok),
      |bm AS (
      |  SELECT doc_id,
      |    round(sum(ln(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
      |      * (tf * 2.2::DOUBLE)
      |      / (tf + (dl / avgdl * 0.75 + 0.25) * 1.2::DOUBLE)), 4) AS bm25
      |  FROM tf JOIN dfreq USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
      |  GROUP BY doc_id)""".stripMargin

  val all: Seq[Q] = Seq(
    // Okapi BM25 over the corpus for a fixed term set — the lexical
    // scoring half of hybrid retrieval / decontamination lookup
    Q.sql(
      "q85_bm25",
      s"""WITH $Bm25Cte
         |SELECT doc_id, bm25 FROM bm
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Retrieval.bm25(Tables.documents(s, d), "doc_id", "text", QueryTerms)
        .orderBy($"doc_id")
    },

    // hybrid retrieval: reciprocal-rank fusion of the BM25 top-100
    // and the embedding-cosine top-100 for query vector 0 — both
    // rankings on rounded scores with id tiebreaks, so the integer
    // ranks (and hence the fused scores) are engine-exact
    Q.sql(
      "q86_rrf_fusion",
      s"""WITH $Bm25Cte,
         |r1 AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT doc_id,
         |      CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
         |    FROM bm) WHERE rank <= 100),
         |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |      FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |scored AS (
         |  SELECT e.vec_id AS doc_id,
         |    round(list_dot_product(e.v, qv)
         |          / sqrt(list_dot_product(e.v, e.v))
         |          / sqrt(list_dot_product(qv, qv)), 6) AS sim
         |  FROM e CROSS JOIN q WHERE e.vec_id <> 0),
         |r2 AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT doc_id,
         |      CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
         |    FROM scored) WHERE rank <= 100),
         |u AS (
         |  SELECT doc_id, CAST(1 AS DOUBLE) / (60 + rank) AS c FROM r1
         |  UNION ALL
         |  SELECT doc_id, CAST(1 AS DOUBLE) / (60 + rank) FROM r2)
         |SELECT doc_id, round(sum(c), 6) AS rrf_score, CAST(count(*) AS BIGINT) AS n_lists
         |FROM u GROUP BY doc_id
         |ORDER BY rrf_score DESC, doc_id
         |LIMIT 20""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val bm = Retrieval.bm25(Tables.documents(s, d), "doc_id", "text", QueryTerms)
      // bound the candidate list BEFORE the rank window, so the global
      // (unpartitioned) row_number only ever sees 100 rows
      val r1 = bm.orderBy($"bm25".desc, $"doc_id").limit(100)
        .withColumn("rank",
          row_number().over(Window.orderBy($"bm25".desc, $"doc_id")).cast("long"))
        .select($"doc_id", $"rank")
      val emb = Tables.embeddings(s, d)
      val r2 = Similarity.bruteForceTopK(
        emb, emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 100)
        .select($"neighbor_id".as("doc_id"), $"rank")
      Retrieval.rrfFuse(Seq(r1, r2), "doc_id")
        .orderBy($"rrf_score".desc, $"doc_id")
        .limit(20)
    },

    // top-50 PMI collocations (c12 >= 5): the phrase-mining signal —
    // count → independence ratio → ln, replayed term-by-term in SQL
    Q.sql(
      "q87_pmi_collocations",
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |bb AS (
        |  SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |  FROM t WHERE len(w) >= 2),
        |uni AS (
        |  SELECT tok, count(*) AS c FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok),
        |bi AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bb
        |  GROUP BY w1, w2 HAVING count(*) >= 5),
        |tot AS (SELECT (SELECT sum(c) FROM uni) AS n_uni, (SELECT count(*) FROM bb) AS n_bi)
        |SELECT w1, w2, c12,
        |  round(ln((c12::DOUBLE / n_bi)
        |        / ((u1.c::DOUBLE / n_uni) * (u2.c::DOUBLE / n_uni))), 4) AS pmi
        |FROM bi JOIN uni u1 ON u1.tok = bi.w1 JOIN uni u2 ON u2.tok = bi.w2 CROSS JOIN tot
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 50""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      LanguageModel.pmiCollocations(Tables.documents(s, d), "doc_id", "text",
        minCount = 5L, k = 50)
    }
  )
}
