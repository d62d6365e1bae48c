#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate (SURVEY §5.1).

Usage: python3 tools/parity.py [sfDir] [verifyOutDir] [only_prefix]

Runs every oracle_sql.json query in DuckDB over the same parquet tables and
compares against the Spark parquet written by graft.Verify: columns sorted by
name, row count, then exact cell-wise equality (floats compared exactly —
the determinism rules are supposed to make them bit-identical).
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if (pd.isna(a) is True) != (pd.isna(b) is True):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cells_equal(x, y) for x, y in zip(la, lb))
    if a == b:
        return True
    # int vs float representations of the same number
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return False

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok, bad = [], []
    for name in sorted(oracle):
        if only and not name.startswith(only):
            continue
        sql = oracle[name]
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            bad.append(name); continue
        try:
            got = norm(pd.read_parquet(f"{out}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            bad.append(name); continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: schema {list(got.columns)} (spark) vs {list(exp.columns)} (oracle)")
            bad.append(name); continue
        # dtype parity: the driver's hasher renders values per-dtype, so an
        # int column on one side vs float/object on the other (e.g. DuckDB
        # HUGEINT from SUM(BIGINT)) hash-fails even when values are equal.
        # float(a)==float(b) below can NEVER catch that — check dtypes here.
        kinds = [(c, got[c].dtype.kind, exp[c].dtype.kind) for c in exp.columns]
        dk = [(c, g, e) for c, g, e in kinds
              if g != e and not (g in "iu" and e in "iu")
              and "O" not in (g, e)]  # object cols (strings/lists) compared cell-wise
        if dk:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle): "
                  + ", ".join(f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c, _, _ in dk))
            bad.append(name); continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} (spark) vs {len(exp)} (oracle)")
            bad.append(name); continue
        mismatch = None
        for i in range(len(exp)):
            for c in exp.columns:
                a, b = got.iloc[i][c], exp.iloc[i][c]
                if not cells_equal(a, b):
                    mismatch = (i, c, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            i, c, a, b = mismatch
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            bad.append(name)
        else:
            ok.append(name)
    print(f"\n{len(ok)} OK, {len(bad)} FAIL" + (": " + " ".join(bad) if bad else ""))
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
