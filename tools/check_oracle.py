#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, load the Verify.scala parquet dump,
sort columns by name, and compare values. Driver-side-only deps (duckdb,
pandas, pyarrow) — this script is tooling, not engine code.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def hugeint_cols(con, sql):
    """Columns DESCRIBE types as int128. MUST use DESCRIBE, not
    cursor.description — duckdb-python 1.0.0 reports 'NUMBER' there
    for every numeric type, which made the r15 guard dead code."""
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    return [d[0] for d in desc
            if "HUGEINT" in str(d[1]).upper() or "INT128" in str(d[1]).upper()]


if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
    # Regression for the exact r15 miss: an uncast sum(BIGINT) twin
    # (DuckDB widens to HUGEINT) must trip the guard; the cast form
    # must not.
    c = duckdb.connect()
    bad = "WITH t(x) AS (VALUES (CAST(1 AS BIGINT))) SELECT sum(x) AS s FROM t"
    good = "WITH t(x) AS (VALUES (CAST(1 AS BIGINT))) SELECT CAST(sum(x) AS BIGINT) AS s FROM t"
    assert hugeint_cols(c, bad) == ["s"], "guard missed sum(BIGINT) -> HUGEINT"
    assert hugeint_cols(c, good) == [], "guard false-positive on cast twin"
    print("selftest OK: HUGEINT guard trips on uncast sum(BIGINT)")
    c.close()
    sys.exit(0)

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        # HUGEINT guard: the driver's hasher canonicalizes DuckDB's
        # int128 differently from Spark's int64, so a twin that types
        # any column HUGEINT hash-fails even when values match (the
        # r10/r11 q_bucketed_join / r15 q_bm25_* failure class). Every
        # integer aggregate must be CAST(... AS BIGINT). cursor
        # .description is useless for this under duckdb-python 1.0.0
        # (every numeric reports the generic 'NUMBER'), so key the
        # guard on DESCRIBE's column_type output, which DOES say
        # HUGEINT — r15 shipped three hash failures because the old
        # description-based guard was dead code.
        huge = hugeint_cols(con, sql)
        if huge:
            print(f"FAIL {name}: HUGEINT column(s) {huge} — CAST the twin to BIGINT")
            fail += 1
            continue
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    want = want[sorted(want.columns)].reset_index(drop=True)
    got = got[sorted(got.columns)].reset_index(drop=True)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
        fail += 1
        continue
    bad = []
    for c in want.columns:
        w, g = want[c], got[c]
        if w.dtype.kind == "f" or g.dtype.kind == "f":
            neq = ~((w == g) | (w.isna() & g.isna()))
        else:
            try:
                neq = w.astype(object).ne(g.astype(object)) & ~(w.isna() & g.isna())
            except Exception:
                neq = pd.Series([True] * len(w))
        n = int(neq.sum())
        if n:
            i = neq.idxmax()
            bad.append(f"{c}: {n} diffs, first@{i} want={w[i]!r} got={g[i]!r}")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad))
        fail += 1
    else:
        print(f"OK   {name} ({len(want)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} passed")
sys.stdout.flush()
# close BEFORE interpreter teardown: duckdb's destructor racing module
# unload can abort (exit 134) AFTER the verdict printed — a clean close
# keeps the exit code meaningful
con.close()
sys.exit(1 if fail else 0)
