#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results + oracle_sql.json:
loads each Spark parquet result, runs the oracle SQL in DuckDB over
the same sf dir, sorts columns by name and rows by all columns, and
compares values exactly (hash-style). Usage:
    python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_glob(sf_dir: str, t: str) -> str:
    """Driver corpora ship single FILES (<dir>/<t>.parquet); Spark-written
    corpora (ScaleCorpus rehearsals, any real deployment) ship DIRECTORIES
    of part files — duckdb needs a glob for those (the FormatsSpec layout
    rule, applied to the oracle side)."""
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize value representations for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    import time

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_glob(sf_dir, t)}')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    report = {}
    for name, sql in sorted(oracle.items()):
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            rec["err"] = f"no spark result: {e}"
            failures += 1
            continue
        t0 = time.monotonic()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            rec["err"] = f"oracle sql error: {e}"
            failures += 1
            continue
        rec["oracle_sec"] = round(time.monotonic() - t0, 3)
        rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        rec["schema_match"] = True
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        rec["rows_match"] = True
        if not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            ndiff = int(diff.any(axis=1).sum())
            print(f"FAIL {name}: {ndiff}/{len(g)} rows differ")
            mask = diff.any(axis=1)
            print("  spark:", g[mask].head(3).to_dict("records"))
            print("  duck :", w[mask].head(3).to_dict("records"))
            failures += 1
            continue
        rec["hash_match"] = True
        print(f"PASS {name} ({len(g)} rows)")
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
