#!/usr/bin/env python3
"""DuckDB proxy-baseline timings for the bench denominator.

Times every oracle SQL (the DuckDB twins of the engine's declared
queries) over the sf parquet tables — 32 threads, median of 3 timed
passes after one untimed warmup, mirroring graft.Bench's protocol —
and writes one JSON object with per-query seconds and the total.

The committed output (BENCH_ORACLE.json) is the denominator for the
"within 2x of the DuckDB proxy" gate: VERDICT r6 flagged that the gate
was being adjudicated from a round-4 judge measurement plus memory,
with nothing in-repo reproducing it.

Usage:
  python3 tools/bench_oracle.py [sfdir] [oracle_sql.json] [out.json]

`oracle_sql.json` is the Verify.scala dump (run `sbt "runMain
graft.Verify"` first, or point at an existing dump). Driver-side-only
deps (duckdb) — tooling, not engine code.
"""
import sys, json, glob, time, statistics

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_ORACLE.json"

con = duckdb.connect()
con.execute("SET threads TO 32")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))

def timed(sql):
    t0 = time.monotonic()
    ok = True
    try:
        # fetch fully — a lazy cursor would under-time materialization
        con.execute(sql).fetchall()
    except Exception:
        ok = False
    sec = time.monotonic() - t0
    return sec if ok else -sec

results, failed = {}, []
for name, sql in sorted(oracle.items()):
    timed(sql)  # warmup: buffer-cache the parquet, plan once
    passes = [timed(sql) for _ in range(3)]
    med = statistics.median(abs(p) for p in passes)
    if all(p > 0 for p in passes):
        results[name] = round(med, 3)
    else:
        results[name] = round(-med, 3)
        failed.append(name)
    print(f"{name:32s} {results[name]:8.3f}s", file=sys.stderr)

total = sum(v for v in results.values() if v > 0)
out = {
    "metric": "duckdb_oracle_total",
    "value": round(total, 3),
    "unit": "sec",
    "threads": 32,
    "protocol": "median-of-3 after 1 warmup, full fetchall",
    "queries": results,
    "failed": failed,
    "sf": sfdir,
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "sf")}))
