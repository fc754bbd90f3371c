#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran.
Loads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: row count, column names, and exact values after sorting
columns by name and rows by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main() -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(got.columns) != sorted(want.columns):
            problems.append(
                f"columns {sorted(got.columns)} vs {sorted(want.columns)}")
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if not problems:
            # The driver's hash is representation-sensitive: an int64
            # Spark column vs a float64 oracle column (e.g. DuckDB's
            # SUM(BIGINT) -> HUGEINT -> pandas float64) fails its hash
            # even when every value is numerically equal. Mirror that
            # here: integer-kind vs float-kind is a hard FAIL.
            def kind_class(k):
                if k in "iu":
                    return "int"
                if k == "f":
                    return "float"
                return None  # strings/bools/objects stay lenient
            for c in sorted(got.columns):
                gk = kind_class(got[c].dtype.kind)
                wk = kind_class(want[c].dtype.kind)
                if gk and wk and gk != wk:
                    problems.append(
                        f"dtype-class col {c}: spark {got[c].dtype} vs "
                        f"oracle {want[c].dtype} (driver hash would "
                        "differ even on equal values — add a CAST in "
                        "the oracle or the query)")
        if not problems:
            g, w = canon(got), canon(want)
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                problems.append(str(e).split("\n")[1][:200])
                # show first differing cells
                for c in g.columns:
                    neq = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                    if neq.any():
                        i = neq.idxmax()
                        problems.append(
                            f"col {c} row {i}: {g[c][i]!r} vs {w[c][i]!r}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
