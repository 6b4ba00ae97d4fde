#!/usr/bin/env python3
"""Min-merge two REPS=3 Bench recordings into bench/medians.json.

Usage: merge_medians.py rec1.log rec2.log [out.json]

Each rec file is the sbt log of a `SPARK_GRAFT_REPS=3 runMain graft.Bench`
run; the JSON line is extracted from it. Per-entry minimum of the two
medians is written (round-9 methodology: two clean recordings, min of
warm medians, which rejects one-sided box-noise inflation). Entries
present in only one recording keep that recording's value.
"""
import json, sys


def load(path):
    for ln in open(path, errors="replace"):
        if '"metric"' in ln and '"queries"' in ln:
            return json.loads(ln[ln.index('{'):])["queries"]
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "bench/medians.json"
    merged = {k: min(a.get(k, 1e9), b.get(k, 1e9)) for k in sorted(set(a) | set(b))}
    json.dump(merged, open(out, "w"), indent=1)
    big = [(k, a.get(k), b.get(k)) for k in merged if k in a and k in b
           and max(a[k], b[k]) / max(min(a[k], b[k]), 1e-9) > 1.5 and max(a[k], b[k]) > 0.5]
    print(f"merged {len(merged)} entries -> {out}; total={sum(merged.values()):.1f}s")
    print(f"{len(big)} entries differ >1.5x between recordings (box noise rejected by min):")
    for k, x, y in sorted(big, key=lambda t: -max(t[1], t[2]) / min(t[1], t[2])):
        print(f"  {k:35s} rec1={x:6.2f} rec2={y:6.2f}")


if __name__ == "__main__":
    main()
