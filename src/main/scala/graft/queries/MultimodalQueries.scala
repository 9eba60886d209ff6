package graft.queries

import graft.{Q, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing over `documents` (text bytes standing in
  * for media payloads): metadata extraction and frame sampling are
  * oracle-matched (byte lengths + sha256 are engine-agnostic); the
  * stubbed per-partition decode is rows-only (its determinism is
  * asserted by MultimodalSpec instead).
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    Q.sql(
      "multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Multimodal.attachPayload(Tables.documents(s, d), "doc_id", "text")
        .select($"doc_id", $"meta.n_bytes".as("n_bytes"), $"meta.sha256".as("sha"))
        .orderBy($"doc_id")
    },

    Q.sql(
      "multimodal_frames",
      """SELECT doc_id, frame_idx,
        |  ((frame_idx + 1) * n // 4) - (frame_idx * n // 4) AS frame_len
        |FROM (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents) t,
        |  (SELECT CAST(range AS BIGINT) AS frame_idx FROM range(4)) f
        |ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.attachPayload(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", n = 4)
        .select($"doc_id", $"frame_idx", $"frame_len")
        .orderBy($"doc_id", $"frame_idx")
    },

    // per-partition stub decode (mapPartitions path) — rows-only;
    // determinism + shape asserted in MultimodalSpec.
    Q.rowsOnly("multimodal_decode") { (s, d) =>
      import s.implicits._
      Multimodal.decodeFeatures(
        Multimodal.attachPayload(Tables.documents(s, d), "doc_id", "text"),
        "doc_id", "payload", dim = 8)
        .orderBy($"id")
    }
  )
}
