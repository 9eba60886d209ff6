#!/usr/bin/env python3
"""Remove named query entries from a CORRECTNESS-style report JSON so
the resumable checker (tools/check_oracle.py) re-verifies them — the
re-certification step after a plan rewrite touches already-certified
queries.

Usage: python3 tools/drop_entries.py <report.json> <q1,q2,...>
"""
import sys, json, os, tempfile

def main(path, names):
    report = json.load(open(path))
    dropped = [n for n in names if report.pop(n, None) is not None]
    # atomic rewrite: a crash mid-dump must not destroy the (expensive,
    # resumable) certificate, so write a sibling temp file and rename
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    print(f"dropped {len(dropped)}/{len(names)} from {path}: {dropped}")

if __name__ == "__main__":
    main(sys.argv[1], [n for n in sys.argv[2].split(",") if n])
