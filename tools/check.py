#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's
parquet dumps against the DuckDB oracle over the same sf dir.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
       python3 tools/check.py --json OUT.json <sfDir> <verifyOutDir> [query ...]
       python3 tools/check.py --chunk 12 [--json OUT.json] <sfDir> <verifyOutDir>

--chunk N runs the sweep as crash-isolated child processes of N
queries each and merges their results: duckdb-python 1.0.0
intermittently SEGFAULTs (exit 139) in native teardown on long
sweeps (observed repeatedly at sf0.1), and a crash mid-sweep
otherwise loses both the tally and the --json artifact. A crashed
chunk is retried once query-by-query so at most the single
crashing query is recorded as an error instead of the whole run.

With --json, also writes a driver-shaped artifact: per-query
{"rows": bool, "schema": bool, "hash": bool} — the committed local
replica of CORRECTNESS_r{N}.json, so a driver-side checker crash can
never zero a round's correctness evidence.

TYPE-STRICT (round 7): both sides are fetched through Arrow and the
column TYPES are compared, not just the cell values. Round 6's driver
checker flagged 7 queries whose oracle left HUGEINT (int128) columns
where Spark emits int64 — DuckDB's Python fetchall() returns plain
ints for both, so the old value-only compare was blind to it. Arrow
exposes HUGEINT as decimal128(38,0) vs int64, and int32 vs int64
stay distinct (the driver is width-sensitive: see the explicit
CAST(... AS INTEGER) convention in the oracle SQL). Tolerated
divergences, calibrated against what the round-6 driver run accepted:
string/large_string, and timestamp with/without tz (values are
normalized to naive UTC before compare).
"""
import datetime
import json
import math
import sys
from pathlib import Path

import duckdb


TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_type(t):
    """Canonical string for an arrow type; tolerant only where the
    round-6 driver run demonstrably tolerated."""
    s = str(t)
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "large_string":
        return "string"
    if s.startswith("large_list"):
        return "list" + s[len("large_list"):]
    return s


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy array
        return tuple(norm_cell(x) for x in v.tolist())
    return v


def driver_unhashable(cols, types):
    """Column types the DRIVER's checker cannot hash/sort even when
    both engines agree on values (round-7 postmortem): decimal128
    with precision > 18 (python Decimal repr is not canonical across
    trailing-zero scales) and any list<> (pandas sort_values throws
    'unhashable type: numpy.ndarray'). Final output schemas must ship
    these as BIGINT-quantized integers or canonical strings."""
    bad = []
    for c, t in zip(cols, types):
        s = str(t)
        if s.startswith("decimal"):
            try:
                prec = int(s.split("(")[1].split(",")[0])
            except (IndexError, ValueError):
                prec = 38
            if prec > 18:
                bad.append(f"{c}: {s}")
        elif s.startswith("list"):
            bad.append(f"{c}: {s}")
    return bad


def canon(tbl):
    """Arrow table -> (sorted rows, sorted col names, matching col types)."""
    cols = list(tbl.schema.names)
    types = [norm_type(f.type) for f in tbl.schema]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    pycols = [tbl.column(i).to_pylist() for i in range(len(cols))]
    out = [tuple(norm_cell(pycols[i][r]) for i in order)
           for r in range(tbl.num_rows)]
    return (sorted(out, key=repr), [cols[i] for i in order],
            [types[i] for i in order])


def run_chunked(chunk, json_out, sf_dir, out_dir, only=()):
    import subprocess
    import tempfile
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    names = sorted(n for n in oracle if not only or n in only)
    merged = {}

    def run_child(qs):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            tmp = tf.name
        p = subprocess.run(
            [sys.executable, __file__, "--json", tmp, sf_dir, out_dir] + qs)
        try:
            return p.returncode, json.loads(Path(tmp).read_text())
        except Exception:
            return p.returncode, None
        finally:
            Path(tmp).unlink(missing_ok=True)

    for i in range(0, len(names), chunk):
        qs = names[i:i + chunk]
        rc, res = run_child(qs)
        if res is not None and len(res) == len(qs):
            merged.update(res)
            continue
        # chunk crashed (segfault) — isolate per query, retry once
        print(f"[chunk] queries {qs[0]}..{qs[-1]} crashed rc={rc}; "
              "isolating per query", file=sys.stderr)
        for q in qs:
            rc1, r1 = run_child([q])
            if r1 is not None and q in r1:
                merged[q] = r1[q]
            else:
                print(f"[chunk] {q} crashed twice (rc={rc1})",
                      file=sys.stderr)
                merged[q] = {"rows": False, "schema": False, "hash": False,
                             "error": f"checker crashed rc={rc1}"}
    n_pass = sum(1 for v in merged.values() if v.get("hash"))
    n_fail = len(merged) - n_pass
    print(f"== {n_pass} pass, {n_fail} fail == (chunked)")
    if json_out:
        Path(json_out).write_text(json.dumps(merged, indent=1))
        print(f"wrote {json_out} ({len(merged)} entries)")
    sys.exit(1 if n_fail else 0)


def main():
    args = sys.argv[1:]
    json_out = None
    chunk = None
    while args and args[0] in ("--json", "--chunk"):
        if args[0] == "--json":
            json_out = args[1]
        else:
            chunk = int(args[1])
        args = args[2:]
    sf_dir, out_dir = args[0], args[1]
    if chunk:
        run_chunked(chunk, json_out, sf_dir, out_dir, only=set(args[2:]))
        return
    only = set(args[2:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}

    def connect():
        # fresh connection per query: one long-lived in-memory DuckDB
        # accumulated state across ~80 heavy queries and segfaulted.
        # Bound threads/memory per instance: 90 serial instances each
        # defaulting to all cores + most of RAM occasionally crash
        # native teardown (observed ~1-in-3 full runs on duckdb 1.0.0)
        con = duckdb.connect(config={"threads": 8, "memory_limit": "8GB"})
        for t in TABLES:
            p = Path(sf_dir, f"{t}.parquet")
            if p.exists():
                # driver testdata is a single file; amplified fixtures
                # (SkewGen) are Spark-written directories
                pat = f"{p}/*.parquet" if p.is_dir() else str(p)
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        return con

    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        pq = Path(out_dir, name)
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            results[name] = {"rows": False, "schema": False, "hash": False,
                             "error": "no spark output"}
            n_fail += 1
            continue
        con = connect()
        try:
            try:
                g_tbl = con.execute(
                    f"SELECT * FROM read_parquet('{pq}/*.parquet')").arrow()
                w_tbl = con.execute(oracle[name]).arrow()
            except Exception as e:
                print(f"FAIL {name}: {e}")
                results[name] = {"rows": False, "schema": False,
                                 "hash": False, "error": str(e)[:200]}
                n_fail += 1
                continue
            g_rows, g_cols, g_types = canon(g_tbl)
            w_rows, w_cols, w_types = canon(w_tbl)
            unh = ([f"spark {d}" for d in driver_unhashable(g_cols, g_types)]
                   + [f"oracle {d}" for d in driver_unhashable(w_cols, w_types)])
            if unh:
                print(f"FAIL {name}: driver-unhashable output types — "
                      + "; ".join(unh))
                results[name] = {"rows": len(g_rows) == len(w_rows),
                                 "schema": False, "hash": False,
                                 "unhashable": unh}
                n_fail += 1
                continue
            if g_cols != w_cols:
                print(f"FAIL {name}: columns {g_cols} vs {w_cols}")
                results[name] = {"rows": len(g_rows) == len(w_rows),
                                 "schema": False, "hash": False}
                n_fail += 1
                continue
            if g_types != w_types:
                diffs = [f"{c}: spark={a} oracle={b}" for c, a, b
                         in zip(g_cols, g_types, w_types) if a != b]
                print(f"FAIL {name}: column TYPES diverge — "
                      + "; ".join(diffs))
                results[name] = {"rows": len(g_rows) == len(w_rows),
                                 "schema": True, "hash": False,
                                 "type_mismatch": diffs}
                n_fail += 1
                continue
            if len(g_rows) != len(w_rows):
                print(f"FAIL {name}: rows {len(g_rows)} vs {len(w_rows)}")
                results[name] = {"rows": False, "schema": True, "hash": False}
                n_fail += 1
                continue
            bad = [(a, b) for a, b in zip(g_rows, w_rows) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)}/{len(g_rows)} row mismatches; first:")
                print("  spark:", bad[0][0])
                print("  duck :", bad[0][1])
                results[name] = {"rows": True, "schema": True, "hash": False}
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g_rows)} rows)")
                results[name] = {"rows": True, "schema": True, "hash": True,
                                 "n": len(g_rows)}
                n_pass += 1
        finally:
            con.close()
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        Path(json_out).write_text(json.dumps(results, indent=1))
        print(f"wrote {json_out} ({len(results)} entries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()


