#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool, not shipped
code): for each query dumped by graft.Verify, run its DuckDB oracle SQL over
the same parquet tables, sort columns by name, and compare values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def cells_equal(a, b):
    a, b = canon(a), canon(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def pandas_hash_mismatch(name, out_dir, duck_rel, con):
    """Mirror the driver's hash: both sides loaded THROUGH DuckDB into
    pandas (the driver does the same — DATE lands as datetime64 on both
    sides), sort columns by name, sort_values over all columns,
    pd.util.hash_pandas_object. Returns a reason string or None."""
    import pandas as pd

    s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    o = duck_rel.df()
    s = s[sorted(s.columns)]
    o = o[sorted(o.columns)]
    try:
        ss = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        oo = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    except TypeError as e:
        return f"driver sort_values would fail (array column?): {e}"
    hs = pd.util.hash_pandas_object(ss, index=False).sum()
    ho = pd.util.hash_pandas_object(oo, index=False).sum()
    if hs == ho:
        return None
    cols = [
        c for c in ss.columns
        if pd.util.hash_pandas_object(ss[c], index=False).sum()
        != pd.util.hash_pandas_object(oo[c], index=False).sum()]
    details = ", ".join(
        f"{c}: spark {ss[c].dtype} vs duck {oo[c].dtype}" for c in cols)
    if not details:
        # per-column hash SUMS can all agree while the frame hash differs
        # (row-wise combination is alignment-sensitive): point at row
        # pairing instead of rendering an empty, unactionable "()"
        details = ("no single column differs — row-level mismatch "
                   "(ordering/pairing of values across columns)")
    return f"pandas-hash mismatch ({details})"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    passed, failed = [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            duck_rel = con.sql(sql)
            s_cols = sorted(spark_rel.columns)
            d_cols = sorted(duck_rel.columns)
            if s_cols != d_cols:
                failed.append((name, f"schema: spark={s_cols} duck={d_cols}"))
                continue
            s_rows = spark_rel.select(
                *[f'"{c}"' for c in s_cols]).fetchall()
            d_rows = duck_rel.select(
                *[f'"{c}"' for c in d_cols]).fetchall()
            if len(s_rows) != len(d_rows):
                failed.append(
                    (name, f"rowcount: spark={len(s_rows)} duck={len(d_rows)}"))
                continue
            bad = None
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                for c, (sv, dv) in zip(s_cols, zip(sr, dr)):
                    if not cells_equal(sv, dv):
                        bad = (i, c, sv, dv)
                        break
                if bad:
                    break
            if bad:
                failed.append(
                    (name, f"row {bad[0]} col {bad[1]}: "
                           f"spark={bad[2]!r} duck={bad[3]!r}"))
                continue
            # Replicate the driver's dtype-sensitive pandas hash: values can
            # be equal while dtypes differ (DuckDB HUGEINT -> float64), or an
            # array column can make sort_values raise — both are driver
            # failures even when the value compare above passes.
            why = pandas_hash_mismatch(name, out_dir, duck_rel, con)
            if why:
                failed.append((name, why))
            else:
                passed.append((name, len(s_rows)))
        except Exception as e:
            failed.append((name, f"error: {type(e).__name__}: {e}"))
    for name, n in passed:
        print(f"PASS {name} ({n} rows)")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, "
          f"{len(oracle)} oracles total")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
