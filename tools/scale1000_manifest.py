#!/usr/bin/env python3
"""Fourth-decade (1000x replica) certificate manifest.

Classifies EVERY gate query into exactly one class so the 1000x
certificate is principled rather than opportunistic:

  certified           in CORRECTNESS_scale1000.json (rows+schema+hash green)
  table-absent        oracle reads embeddings — the one table no 1000x
                      replica can carry on this disk (~41 GB of vectors;
                      certified through the full-table 10x replica
                      instead). The lineitem family moved OUT of this
                      class in round 14: commit 4432b19's shuffle-light
                      replication made the 600M-row replica generatable
                      (5.2 GB), and the readers are now certified rows
  infeasible-oracle   the DuckDB oracle side is the blocker: q72/q73 replay
                      an unrolled 24-round pointer-jumping CTE (16 s at
                      sf0.1 already, multi-hour at 1000x), q140's oracle
                      grid is >80 GB, and the four n-proportional oracle
                      grids (q78/q88/q103/q150 families) blow up on BOTH
                      engines' oracle formulation — each family keeps a
                      100x-certified member
  infeasible-harness  this box is the blocker: q125's tagged bucket
                      self-join legitimately spills tens of GB, beyond the
                      thin-provisioned disk's REAL free blocks

Usage: python3 tools/scale1000_manifest.py [--markdown]
Exits nonzero if any query is unclassified — adding a query to the gate
without either certifying it at 1000x or extending a class here fails.
"""
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# the one table no 1000x replica carries: embeddings is ~41 GB of
# vectors, beyond the thin disk's real free blocks. The
# events+documents replica (graft_scale_x1000), the customer+orders
# replica (graft_scale_co1000, round 13), and the lineitem replica
# (graft_scale_li1000, 600M rows / 5.2 GB, generatable since 4432b19's
# repartition-the-input fix) cover everything else.
ABSENT_TABLES = re.compile(r"\b(embeddings)\b", re.I)

INFEASIBLE_ORACLE = {
    "q72_cc_stars": "24-round pointer-jumping CTE oracle (16 s at sf0.1; multi-hour at 1000x); 100x-certified",
    "q73_cluster_reps": "same pointer-jumping oracle family as q72; 100x-certified",
    "q140_naive_bayes": "oracle token-grid replay >80 GB at the 1000x corpus; 100x-certified",
    "q78_semantic_dedup": "n-proportional oracle pair grid; family member q151/q152 1000x-path-certified at 100x",
    "q88_kmeans_lloyd": "k grows with n in the oracle grid; family member q151 certified",
    "q103_mrl_recall": "n-proportional recall grid on both sides; family member q148 certified at 100x",
    "q150_semdedup_bucketed": "n-proportional oracle grid; bucketed family certified via q151/q152",
}
INFEASIBLE_HARNESS = {
    "q125_lsh_tuning": "bucket self-join spill (~tens of GB) exceeds the thin-provisioned disk's real free blocks; 100x-certified",
    "q74_edit1_join": "output ~480M pair rows at the 1000x vocabulary (x12 per decade) exceeds the pandas-hash compare harness; Spark side MEASURED at 1000x (510 s, per-decade slope 5.9) and hash-certified through 100x",
}


def classify():
    # pick the latest gate round by PARSED round number, not string sort
    # (lexicographic order would put r100 before r99)
    latest = max(REPO.glob("CORRECTNESS_r[0-9]*.json"),
                 key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)))
    all_q = sorted(json.load(open(latest)).keys())
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

    rows = []
    for q in all_q:
        if q in cert:
            rows.append((q, "certified", f"{cert[q].get('spark_rows', '?')} rows hash-match"))
        elif q in INFEASIBLE_ORACLE:
            rows.append((q, "infeasible-oracle", INFEASIBLE_ORACLE[q]))
        elif q in INFEASIBLE_HARNESS:
            rows.append((q, "infeasible-harness", INFEASIBLE_HARNESS[q]))
        elif q in oracle and ABSENT_TABLES.search(oracle[q]):
            tabs = ",".join(sorted({t.lower() for t in ABSENT_TABLES.findall(oracle[q])}))
            rows.append((q, "table-absent", f"reads {tabs}; certified at the full-table 10x replica"))
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
        for cls in ["certified", "table-absent", "infeasible-oracle", "infeasible-harness", "UNCLASSIFIED"]:
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
