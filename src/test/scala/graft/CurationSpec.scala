package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("assignSplit: exhaustive, deterministic, layout-invariant") {
    val assigned = Curation.assignSplit(docs, "doc_id")
    assert(assigned.count() == docs.count())
    assert(assigned.filter(!$"split".isin("train", "val", "test")).count() == 0)
    // same assignment regardless of partition layout — the property
    // that keeps test data out of train across re-runs
    val reparted = Curation.assignSplit(docs.repartition(13), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val base = assigned.select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(reparted == base)
    // roughly the requested proportions (hash bucket uniformity)
    val frac = assigned.filter($"split" === "train").count().toDouble / assigned.count()
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac far from 0.8")
    // invalid percentages rejected
    intercept[IllegalArgumentException] {
      Curation.assignSplit(docs, "doc_id", trainPct = 90, valPct = 20)
    }
  }

  test("groupQuota caps every group and keeps lowest ids") {
    val capped = Curation.groupQuota(docs, "source", "doc_id", quota = 10)
    val maxPerSource = capped.groupBy("source").count().agg(max("count")).as[Long].head()
    assert(maxPerSource <= 10)
    // kept ids are each source's smallest
    val minDropped = docs.join(capped.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(min("doc_id").as("min_dropped"))
    val maxKept = capped.groupBy("source").agg(max("doc_id").as("max_kept"))
    val violations = minDropped.join(maxKept, "source")
      .filter($"min_dropped" < $"max_kept").count()
    assert(violations == 0)
  }

  test("chunkTokens partitions every document's tokens exactly") {
    val chunks = Curation.chunkTokens(docs, "doc_id", "text", chunkSize = 32)
    // chunk lengths per doc sum to the doc's token count
    val sums = chunks.groupBy("doc_id").agg(sum("chunk_len").as("total"))
    val toks = docs.select($"doc_id",
      size(graft.functions.TextFunctions.tokens($"text")).cast("long").as("n"))
    assert(sums.join(toks, "doc_id").filter($"total" =!= $"n").count() == 0)
    // all chunks but each doc's last are exactly chunkSize
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val nonFinalShort = chunks
      .withColumn("max_idx", max("chunk_idx").over(w))
      .filter($"chunk_idx" < $"max_idx" && $"chunk_len" =!= 32)
    assert(nonFinalShort.count() == 0)
  }

  test("vocabTopK returns k most frequent tokens, deterministically") {
    val v = Curation.vocabTopK(docs, "text", k = 20).collect()
    assert(v.length == 20)
    val freqs = v.map(_.getLong(1))
    assert(freqs.sorted.reverse.toSeq == freqs.toSeq) // descending
    val again = Curation.vocabTopK(docs.repartition(7), "text", k = 20).collect()
    assert(again.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      v.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
