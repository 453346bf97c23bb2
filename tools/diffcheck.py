#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/diffcheck.py [verify_out_dir] [sf_dir]

Registers the sf tables as DuckDB views, runs every oracle SQL from
oracle_sql.json, and compares against the Spark parquet outputs the same way
the driver does (columns sorted by name, rows sorted, exact value compare).
Dev-tool only — not part of the Spark library.
"""
import sys, json
import duckdb, pandas as pd, numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        e = canon(con.sql(sql).df())
        g = canon(pd.read_parquet(f"{out}/{name}"))
        assert list(e.columns) == list(g.columns), \
            f"cols exp={list(e.columns)} got={list(g.columns)}"
        assert len(e) == len(g), f"rows exp={len(e)} got={len(g)}"
        for c in e.columns:
            a, b = e[c], g[c]
            # The driver's hasher distinguishes int from float (42 vs
            # 42.0). DuckDB sum(BIGINT) returns HUGEINT which pandas
            # renders as float64 — without this assert that mismatch
            # would silently route to the allclose branch and pass.
            assert a.dtype.kind == b.dtype.kind, \
                f"dtype col {c}: oracle {a.dtype} vs spark {b.dtype}"
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                assert np.allclose(a.astype(float).fillna(-1e300),
                                   b.astype(float).fillna(-1e300),
                                   rtol=0, atol=0), f"float col {c}"
            else:
                ae = a.astype(object).where(pd.notnull(a), None)
                be = b.astype(object).where(pd.notnull(b), None)
                # pandas object compare treats None == None as UNEQUAL;
                # accept matched nulls explicitly (gate columns should
                # still avoid nulls — the driver's hasher is its own law)
                both_null = pd.isnull(a) & pd.isnull(b)
                assert ((ae == be) | both_null).all(), f"col {c}"
    except Exception as ex:
        # Verify filters oracle_sql.json to the queries it dumped, so a
        # missing parquet here means the query CRASHED during the dump —
        # that is a failure, never a skip.
        fails.append((name, f"{type(ex).__name__}: {str(ex)[:300]}"))

for n, m in fails:
    print("FAIL", n, "--", m)
checked = len(oracle)
print(f"{checked - len(fails)}/{checked} oracle queries pass")
sys.exit(1 if fails else 0)
