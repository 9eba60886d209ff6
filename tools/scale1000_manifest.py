#!/usr/bin/env python3
"""Fourth-decade (1000x replica) certificate manifest.

Classifies EVERY gate query into exactly one class so the 1000x
certificate is principled rather than opportunistic:

  certified           in CORRECTNESS_scale1000.json (rows+schema+hash green)
  infeasible-oracle   the DuckDB oracle side is the blocker: q72/q73 replay
                      an unrolled 24-round pointer-jumping CTE (16 s at
                      sf0.1 already, multi-hour at 1000x), q140's oracle
                      grid is >80 GB, the n-proportional oracle grids
                      (q78/q88/q103/q150 families) blow up on BOTH
                      engines' formulation (ann_topk_ivf's n*n/50 grid
                      graduated to certified in round 16: the fused
                      BestCentroid kernel made the Spark side 19 min and
                      the min(STRUCT) oracle completed in ~25 min), and
                      q95's pairwise kNN oracle OOMs single-node DuckDB
                      (83.8 GiB pin failure measured at 2M vectors) —
                      each family keeps a 100x-certified member
  infeasible-harness  this box is the blocker: legitimate spills (sorts,
                      bucket self-joins, oracle pair grids) exceed the
                      thin-provisioned disk's REAL free blocks — q125,
                      q151's oracle spill at a 105 GB memlimit (its Spark
                      side is green in ~7 min with the native sqdist
                      kernel; q152's Spark side went green too in round
                      15 after the narrow-argmax assignment rewrite), and
                      three learned-op oracles (q143/q147/q149)

There is no table-absent class anymore: round 14 measured the
embeddings 1000x replica at 88 MB (2M vectors of dim 64 — the earlier
"~41 GB" estimate was wrong by ~470x), generated it
(/tmp/graft_scale_emb1000, with 5M documents alongside), and drained
28 of the 35 embeddings readers into the certificate; the other 7 are
named above.

Usage: python3 tools/scale1000_manifest.py [--markdown]
Exits nonzero if any query is unclassified — adding a query to the gate
without either certifying it at 1000x or extending a class here fails.

tools/oracle_sql_snapshot.json refresh rule: regenerate it from a fresh
graft.Verify dump (cp <outDir>/oracle_sql.json tools/oracle_sql_snapshot.json)
EVERY time SparkEntry.queries grows or an oracle statement changes — a
stale snapshot silently under-covers the suite here and in any DuckDB
bench replayed from it (round 14 shipped three queries past a 192-query
snapshot before this rule was written down).
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# All five fact replicas are generatable on this disk: events+documents
# (graft_scale_x1000), customer+orders (graft_scale_co1000, round 13),
# lineitem (graft_scale_li1000, 600M rows / 5.2 GB, since 4432b19's
# repartition-the-input fix), and — round 14 — embeddings+documents
# (graft_scale_emb1000, 903 MB total; the embeddings table itself is
# 88 MB, not the "~41 GB" earlier rounds assumed).

INFEASIBLE_ORACLE = {
    "q72_cc_stars": "24-round pointer-jumping CTE oracle (16 s at sf0.1; multi-hour at 1000x); Spark side MEASURED green at the 5M-doc replica (round 15); 100x-certified",
    "q73_cluster_reps": "same pointer-jumping oracle family as q72; Spark side MEASURED green at the 5M-doc replica (round 15); 100x-certified",
    "q140_naive_bayes": "oracle token-grid replay >80 GB at the 1000x corpus; Spark side MEASURED green at the 5M-doc replica (round 15); 100x-certified",
    "q78_semantic_dedup": "n-proportional oracle pair grid; bucketed family member q152 certified at 100x, q151 AND q152 Spark-side green at 1000x",
    "q88_kmeans_lloyd": "k grows with n in the oracle grid; family member q151 Spark-side MEASURED green at 1000x (~7 min, native sqdist)",
    "q103_mrl_recall": "n-proportional recall grid on both sides (vec_id % 50 query set grows with the corpus); its hash-rank-sampled scale path q166_mrl_recall_sampled (round 17: 20 hash-ranked queries bound both engines' grids to 20*n) is hash-certified at sf0.01/10x/100x AND the 2M-vector 1000x replica; family member q148 also certified at 1000x",
    "q150_semdedup_bucketed": "n-proportional oracle grid (the PINNED planes=4 replay dial, on both sides by construction); the auto-dial scale path is q152, Spark-side green at 2M vectors",
    "q95_knn_classify": "pairwise kNN oracle OOMs single-node DuckDB (83.8 GiB pin failure MEASURED at the 2M-vector replica); Spark side MEASURED green at 2M vectors (round 15); 100x-certified; its hash-rank-sampled scale path q165_knn_classify_sampled (round 17: 20 hash-ranked queries + narrow-MATERIALIZED score stage) is hash-certified at sf0.01/10x/100x AND the 2M-vector 1000x replica on BOTH engines",
    "q152_semdedup_sqrtk": "Spark side MEASURED green at 2M vectors (351 s sbt-total, round-15 narrow-argmax assignment; 1578 survivors, two independent plan shapes agree) — the old wide window-argmax's SPILL_OUT_OF_MEMORY is fixed; the oracle side (n*sqrt(n) LSH/pair grid + 24-round pointer-jumping CTE) is the same single-node class as q151's measured IO Error; 100x-certified",
}
INFEASIBLE_HARNESS = {
    "q125_lsh_tuning": "BOTH sides measured at the 5M-doc replica (round 15): the (6,2) config legitimately over-candidates ~600x (its precision row is the tuning table's point) -> ~157M exact-verify pairs x ~1.2KB shingle arrays = hundreds of GB of pair-array traffic on ANY engine — Spark's verify shuffle exceeds the thin disk (No space, measured twice, incl. after the round-15 shuffle_hash/narrow-join rewrite that removed every candidate-stream sort), and DuckDB's oracle replay IO-errors the same way; a production tuning run samples the verify — that operator is q164_lsh_tuning_sampled (round 16), FULLY hash-certified at this same 5M-doc replica on BOTH engines (exact candidate counts, rate-bounded sampled verify), so the family has a fourth-decade member; the exact-count formulation stays for the oracle contract; 100x-certified",
    "q74_edit1_join": "output ~480M pair rows at the 1000x vocabulary (x12 per decade) exceeds the pandas-hash compare harness; Spark side MEASURED at 1000x (510 s, per-decade slope 5.9) and hash-certified through 100x",
    "q151_kmeans_sqrtk": "Spark side MEASURED green at 1000x (~7 min, native sqdist kernel); the n*sqrt(n) oracle grid spills past the thin disk's real free blocks even at a 105 GB memlimit (IO Error MEASURED); 100x-certified",
    "q143_mmr": "oracle spill exceeds the thin disk's real free blocks (IO Error MEASURED at the 2M-vector replica); Spark side MEASURED green at 2M vectors (round 15); 100x-certified",
    "q147_learned_gate": "oracle spill exceeds the thin disk's real free blocks (IO Error MEASURED); Spark side MEASURED green at 2M vectors (round 15); 100x-certified",
    "q149_brier": "oracle spill exceeds the thin disk's real free blocks (IO Error MEASURED); Spark side MEASURED green at 2M vectors (round 15); 100x-certified",
}


def classify():
    # pick the latest gate round by PARSED round number, not string sort
    # (lexicographic order would put r100 before r99)
    latest = max(REPO.glob("CORRECTNESS_r[0-9]*.json"),
                 key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)))
    cert = json.load(open(REPO / "CORRECTNESS_scale1000.json"))
    oracle_path = REPO / "tools" / "oracle_sql_snapshot.json"
    if not oracle_path.exists():
        # fall back to the NEWEST verify dump the caller produced
        import glob, os
        cands = sorted(glob.glob("/tmp/*/oracle_sql.json"), key=os.path.getmtime)
        if not cands:
            sys.exit("no oracle_sql.json snapshot; run graft.Verify first")
        oracle_path = cands[-1]
    oracle = json.load(open(oracle_path))
    # the universe is the UNION of the last gate round and the current
    # oracle snapshot: a query added since the last driver run (e.g.
    # round 15's q163 against the r14 gate file) must still hit the
    # UNCLASSIFIED check — a gate-file-only universe is blind to
    # exactly the queries most likely to lack a certificate
    all_q = sorted(set(json.load(open(latest)).keys()) | set(oracle.keys()))

    rows = []
    for q in all_q:
        if q in cert:
            rows.append((q, "certified", f"{cert[q].get('spark_rows', '?')} rows hash-match"))
        elif q in INFEASIBLE_ORACLE:
            rows.append((q, "infeasible-oracle", INFEASIBLE_ORACLE[q]))
        elif q in INFEASIBLE_HARNESS:
            rows.append((q, "infeasible-harness", INFEASIBLE_HARNESS[q]))
        else:
            rows.append((q, "UNCLASSIFIED", ""))
    return rows


def main():
    rows = classify()
    counts = {}
    for _, c, _ in rows:
        counts[c] = counts.get(c, 0) + 1
    if "--markdown" in sys.argv:
        print("| class | queries |")
        print("|---|---|")
        for cls in ["certified", "infeasible-oracle", "infeasible-harness", "UNCLASSIFIED"]:
            qs = [q for q, c, _ in rows if c == cls]
            if qs:
                print(f"| {cls} ({len(qs)}) | {' '.join(qs)} |")
    else:
        w = max(len(q) for q, _, _ in rows)
        for q, c, note in rows:
            print(f"{q:<{w}}  {c:<18}  {note}")
    print(f"\n== {', '.join(f'{k}: {v}' for k, v in sorted(counts.items()))} ==", file=sys.stderr)
    if counts.get("UNCLASSIFIED"):
        sys.exit(f"{counts['UNCLASSIFIED']} queries unclassified — certify at 1000x or extend a manifest class")


if __name__ == "__main__":
    main()
