#!/usr/bin/env python3
"""Local rehearsal of the driver's correctness compare: run each oracle SQL
in DuckDB against the same parquet tables and diff against the Spark dump
(column-name-sorted, row-sorted, value-normalized). Usage:
    python3 scripts/crosscheck.py /tmp/vout /root/testdata/sf0.01
"""
import json
import math
import sys

import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"create view {tbl} as select * from '{sfdir}/{tbl}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"select * from '{outdir}/{name}/*.parquet'")
        want = con.sql(sql)
        gcols = sorted(got.columns)
        wcols = sorted(want.columns)
        if gcols != wcols:
            fails.append((name, f"columns {gcols} vs {wcols}"))
            continue
        # TYPE-strict: the driver hashes typed values, so e.g. Spark's
        # sum(int)=BIGINT vs DuckDB's sum(int)=HUGEINT mismatches even when
        # the numbers agree. Round 1 passed 25/25 here but 22/25 on the
        # driver because values were string-normalized; compare dtypes too.
        # Plain integer WIDTHS are interchangeable (round-1 driver evidence:
        # INTEGER-vs-BIGINT queries q05/q09/q19/q22/q23 were hash-green,
        # only the HUGEINT ones failed), so they normalize to one class.
        def ty(t):
            t = str(t)
            return "INTCLASS" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        gtypes = {c: ty(t) for c, t in zip(got.columns, got.types)}
        wtypes = {c: ty(t) for c, t in zip(want.columns, want.types)}
        tdiff = {c: (gtypes[c], wtypes[c]) for c in gcols if gtypes[c] != wtypes[c]}
        if tdiff:
            fails.append((name, f"types differ (spark vs oracle): {tdiff}"))
            continue
        grows = sorted(tuple(norm(v) for v in r) for r in
                       got.select(", ".join(f'"{c}"' for c in gcols)).fetchall())
        wrows = sorted(tuple(norm(v) for v in r) for r in
                       want.select(", ".join(f'"{c}"' for c in wcols)).fetchall())
        if len(grows) != len(wrows):
            fails.append((name, f"rows {len(grows)} vs {len(wrows)}"))
        elif grows != wrows:
            bad = [(a, b) for a, b in zip(grows, wrows) if a != b][:3]
            fails.append((name, f"values differ, e.g. {bad}"))
        else:
            print(f"OK   {name} ({len(grows)} rows)")
    except Exception as e:
        fails.append((name, f"error: {e}"))

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
