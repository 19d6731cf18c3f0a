#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads outDir/<name>/ parquet (Spark result) + outDir/oracle_sql.json,
runs each oracle against DuckDB views over the sfDir parquet tables,
and compares row count, column names, and sorted values.
"""
import sys, json, glob, math
import duckdb, pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Queries whose CONTRACT is emptiness on clean input (none today — see
# NonVacuitySpec's doc for the bar an entry must clear). A 0-row result
# from anything else means the oracle match proves two empty sets equal
# (the q7_volume class, vacuous for 13 rounds) and FAILS here.
EMPTY_OK = set()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try: df[c] = df[c].dt.tz_localize(None)
            except Exception: pass
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir, json_out=None):
    results = {}

    def record(name, ok, err, spark_rows=None, oracle_rows=None,
               schema_ok=None):
        # schema_ok is tracked EXPLICITLY by the caller (True once the
        # column-name check passed), not inferred from the error prefix:
        # 'rows differ' / 'vacuous' / 'spark result missing' failures
        # used to publish schema_match=False even when columns matched,
        # misclassifying them as schema breaks in the CORRECTNESS json.
        results[name] = {
            "rows_match": ok or (spark_rows is not None
                                 and spark_rows == oracle_rows),
            "schema_match": ok or bool(schema_ok),
            "hash_match": ok,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows,
            "err": None if ok else err,
        }

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    import time
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1
            record(name, False, f"oracle error: {e}"); continue
        try:
            got = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}"); n_fail += 1
            record(name, False, f"spark result missing: {e}",
                   oracle_rows=len(want)); continue
        if sorted(want.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns differ: oracle={sorted(want.columns)} spark={sorted(got.columns)}"); n_fail += 1
            record(name, False, "columns differ",
                   spark_rows=len(got), oracle_rows=len(want)); continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(want)} spark={len(got)}"); n_fail += 1
            record(name, False, "rows differ", spark_rows=len(got),
                   oracle_rows=len(want), schema_ok=True); continue
        if len(want) == 0 and name not in EMPTY_OK:
            print(f"FAIL {name}: vacuous (0 rows on both sides -- the match proves nothing)"); n_fail += 1
            record(name, False, "vacuous (0 rows both sides)",
                   spark_rows=0, oracle_rows=0, schema_ok=True); continue
        w, g = norm(want), norm(got)
        bad = None
        # The driver hashes stringified values, so int64 1 vs float64 1.0 is a
        # hash FAIL even though pandas == says equal. Mirror that strictness.
        kind_bad = [c for c in w.columns if w[c].dtype.kind != g[c].dtype.kind]
        if kind_bad:
            c = kind_bad[0]
            print(f"FAIL {name}: dtype kind differs col={c} oracle={w[c].dtype} spark={g[c].dtype}"); n_fail += 1
            record(name, False, f"dtype kind differs col={c}",
                   spark_rows=len(got), oracle_rows=len(want)); continue
        for c in w.columns:
            wc, gc = w[c], g[c]
            if wc.dtype == "float64":
                eq = (wc == gc) | (wc.isna() & gc.isna())
            else:
                eq = (wc.astype(str) == gc.astype(str))
            if not eq.all():
                i = int((~eq).idxmax()); bad = (c, wc.iloc[i], gc.iloc[i]); break
        if bad:
            print(f"FAIL {name}: value mismatch col={bad[0]} oracle={bad[1]!r} spark={bad[2]!r}"); n_fail += 1
            record(name, False,
                   f"value mismatch col={bad[0]} oracle={bad[1]!r} spark={bad[2]!r}",
                   spark_rows=len(got), oracle_rows=len(want), schema_ok=True)
        else:
            print(f"PASS {name} ({len(want)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            record(name, True, None, spark_rows=len(got), oracle_rows=len(want))
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

def bench_gate():
    """Round-loop perf gate (r12 verdict directive 7): after correctness,
    compare the latest full sweep against the newest committed per-round
    map with tools/bench_regress.py. Nothing used to FORCE the regression
    gate to run -- a quiet-box >2x regression could reach the verdict
    unflagged. Skips (exit 0, with a note) when either artifact is
    missing or when GRAFT_SKIP_BENCH_GATE=1 (dev loops on subsets);
    otherwise propagates bench_regress's exit code, so a real regression
    fails this gate exactly like a correctness FAIL does.
    """
    import os, re, subprocess
    if os.environ.get("GRAFT_SKIP_BENCH_GATE") == "1":
        print("bench gate: skipped (GRAFT_SKIP_BENCH_GATE=1)")
        return 0
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = os.path.join(root, "BENCH_FULL_LATEST.json")
    # Preferred baseline: BENCH_BASELINE.json, the accepted prior-round
    # full sweep (promoted from BENCH_FULL_LATEST.json at round close,
    # quiet-box by construction). Fallback: newest BENCH_LOCAL_r*.json
    # (historical mid-round snapshots, often contended).
    pinned = os.path.join(root, "BENCH_BASELINE.json")
    rounds = sorted(glob.glob(os.path.join(root, "BENCH_LOCAL_r*.json")),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    base = pinned if os.path.exists(pinned) else (rounds[-1] if rounds else None)
    if base is None or not os.path.exists(latest):
        print("bench gate: skipped (no baseline or no "
              "BENCH_FULL_LATEST.json sweep)")
        return 0
    print(f"bench gate: {os.path.basename(base)} vs BENCH_FULL_LATEST.json")
    r = subprocess.run([sys.executable,
                        os.path.join(root, "tools", "bench_regress.py"),
                        base, latest])
    return r.returncode

if __name__ == "__main__":
    # optional 3rd arg: write a driver-style per-query JSON artifact
    # (the CORRECTNESS_r{N}.json shape) -- used to publish off-cycle
    # sweeps like the sf1 decade audit.
    rc = main(sys.argv[1], sys.argv[2],
              json_out=sys.argv[3] if len(sys.argv) > 3 else None)
    sys.exit(rc or bench_gate())
